package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** N-gram language-model perplexity scoring — the CCNet-style quality
  * filter (Wenzek et al. 2020: rank crawl documents by the perplexity of
  * a LM trained on a trusted reference corpus; the low-perplexity head is
  * the training-data keep set). Here the LM is a bigram model with
  * add-one (Laplace) smoothing: p(w2|w1) = (c(w1,w2) + 1) / (c(w1) + V).
  *
  * Distributed shape: training is two streaming aggregates over the
  * reference token stream (bigram counts and context counts — bigram
  * keys shuffle once, map-side combined) plus a 1-row vocab-size
  * aggregate; scoring joins the target bigram stream against the two
  * count frames on their n-gram keys (observed-bigram-scale and
  * vocab-scale — at web scale both stay shuffle joins under AQE; the
  * high-frequency context keys are one row on the model side, the
  * skew-join-friendly shape) and reduces per document. Nothing is ever
  * driver-side: the model lives in frames, not a collected map.
  *
  * Determinism: each transition's ln p is rounded to 1e-6 fixed point
  * and summed as BIGINT micro-nats — integer addition commutes, so the
  * per-document score is independent of partitioning and join order
  * (the engine's oracle-safe-sum pattern). Unseen bigrams and unseen
  * contexts are exactly the smoothing's 1/(c+V) path, so OOV scoring is
  * part of the pinned arithmetic, not a special case.
  */
object NgramLm {

  // r18: native one-pass n-gram struct stream (WordNgramStructs) instead
  // of the interpreted zip_with-over-slices HOF — higher-order functions
  // are CodegenFallback and dispatched a lambda + two array slices per
  // position on the hottest LM scan; the native expression is one tight
  // loop per document over the same pinned-parity tokenizer (short docs →
  // empty array, identical to the old when(size>=2) guard; parity spec:
  // NgramStructParitySpec).
  private def bigrams(df: DataFrame,
      cols: Seq[org.apache.spark.sql.Column], textCol: String) =
    df.select(cols :+
      graft.functions.expr.WordNgramStructs(col(textCol), 2).as("bg"): _*)

  /** r19: explode a COMPUTED n-gram array through an OUTER generate plus a
    * null filter instead of a bare `explode`. A non-outer explode makes
    * InferFiltersFromGenerate add `size(e) > 0 AND isnotnull(e)` on the
    * generator input, and PushDownPredicates then substitutes the alias
    * through the projection into the scan Filter — re-evaluating the
    * tokenize+window expression up to 3× per reference row (the r18
    * verdict's top item; guide §4.4's filter-duplication, native-
    * expression flavor). An outer generate gets NO inferred filter; the
    * single null row it emits for a short/empty document is dropped right
    * above the Generate, so the downstream aggregate input is identical
    * row for row. The struct elements themselves are non-nullable
    * (containsNull = false), so `isNotNull` drops exactly the synthetic
    * empty-array row and nothing else. */
  private def explodedRef(df: DataFrame, arr: String): DataFrame =
    df.select(explode_outer(col(arr)).as("p")).filter(col("p").isNotNull)

  /** r19: the vocab token stream, same outer-generate doctrine — the
    * existing `w != ''` filter already drops the synthetic null row an
    * outer explode emits for a null/absent text. */
  private def vocabTokens(reference: DataFrame, refTextCol: String): DataFrame =
    reference.select(explode_outer(TextTokens.tokens(col(refTextCol))).as("w"))
      .filter(col("w") =!= "")

  /** Shared scaffold of the Kneser-Ney FAMILY ([[scoreKneserNey]],
    * [[scoreModifiedKneserNey]]): persisted bigram type counts, a
    * caller-shaped per-context rollup, continuation counts N1+(·,w2),
    * the B/V totals broadcast, the 4-way scoring join, and the
    * micro-nat per-doc reduce — ONE copy of the pinned-arithmetic
    * plumbing, so a fix to the op order or the persist discipline
    * cannot drift between the variants (they differ only in the
    * per-context aggregate columns and the probability expression).
    * `pFor` receives the persisted bigram-count frame (modified KN
    * folds its count-of-counts over it before building the plan) and
    * returns the per-transition probability over the post-join names
    * (c2, c1, the cn extras, n1r, b, v). */
  private def knScaffold(reference: DataFrame, refTextCol: String,
      target: DataFrame, idCol: String, textCol: String,
      cnAggs: Seq[org.apache.spark.sql.Column],
      pFor: DataFrame => org.apache.spark.sql.Column): DataFrame = {
    val refBg = explodedRef(bigrams(reference, Seq.empty, refTextCol), "bg")
    val c2 = graft.engine.BoundedCaches.persist(
      refBg.groupBy(col("p.w1").as("w1"), col("p.w2").as("w2"))
        .agg(count(lit(1)).as("c2")))
    val cn = c2.groupBy(col("w1").as("ctx")).agg(cnAggs.head, cnAggs.tail: _*)
    val nr = c2.groupBy(col("w2").as("nw2")).agg(count(lit(1)).as("n1r"))
    val tot = c2.agg(count(lit(1)).as("b")).crossJoin(
      vocabTokens(reference, refTextCol)
        .agg(count_distinct(col("w")).as("v")))
    val tgt = bigrams(target, Seq(col(idCol).as("id")), textCol)
      .select(col("id"), explode_outer(col("bg")).as("p"))
    // degenerate-reference guard: a token-less reference makes the
    // continuation denominator B+V zero → p_cont = +Infinity → ln(Inf)
    // would CAST to Long.MaxValue micro-nats, a silently absurd score
    // (DuckDB fails the cast instead — engine divergence). The guard is
    // a lazy CaseWhen branch: green-path arithmetic is byte-identical.
    val p = when((col("b") + col("v")) === 0L,
        raise_error(lit("empty reference corpus — B+V is 0; the " +
          "Kneser-Ney family needs a tokenized reference")))
      .otherwise(pFor(c2))
    val scored = tgt
      .join(c2, tgt("p.w1") === c2("w1") && tgt("p.w2") === c2("w2"), "left")
      .join(cn, tgt("p.w1") === cn("ctx"), "left")
      .join(nr, tgt("p.w2") === nr("nw2"), "left")
      .crossJoin(broadcast(tot))
      .select(col("id"), col("p"),
        when(col("p").isNotNull,
          round(log(p) * lit(1000000.0)).cast("long")).as("lp"))
      .groupBy(col("id"))
      .agg(count(col("p")).as("n_scored"),
        coalesce(sum(col("lp")), lit(0L)).as("logprob_fp6"))
    scored.select(col("id").as(idCol), col("n_scored"), col("logprob_fp6"))
  }

  /** The add-one-smoothed continuation probability shared by the KN
    * family: ((n1r + 1)/(B + V)) as (numerator, denominator) doubles in
    * the pinned cast order. */
  private def contTerms: (org.apache.spark.sql.Column, org.apache.spark.sql.Column) =
    ((coalesce(col("n1r"), lit(0L)) + lit(1L)).cast("double"),
      (col("b") + col("v")).cast("double"))

  /** Score `target` docs under a bigram LM trained on `reference`.
    *
    * @return (idCol, n_scored, logprob_fp6) — `n_scored` is the number
    *         of scored transitions (tokens − 1), `logprob_fp6` the sum
    *         of per-transition ln-probabilities in 1e-6 fixed point
    *         (micro-nats, BIGINT; more negative = higher perplexity).
    *         Docs with fewer than 2 tokens carry n_scored = 0.
    */
  def scoreBigram(reference: DataFrame, refTextCol: String,
      target: DataFrame, idCol: String, textCol: String): DataFrame = {

    val refBg = explodedRef(bigrams(reference, Seq.empty, refTextCol), "bg")
    // c2 feeds BOTH the scoring join and the context-count rollup —
    // persist so the bigram explode+agg runs once (q9 trap; bounded
    // registry per the cache contract)
    val c2 = graft.engine.BoundedCaches.persist(
      refBg.groupBy(col("p.w1").as("w1"), col("p.w2").as("w2"))
        .agg(count(lit(1)).as("c2")))
    // context counts and vocab are rollups of frames already built — the
    // reference stream is tokenized once for bigrams, once for vocab
    val c1 = c2.groupBy(col("w1").as("ctx")).agg(sum(col("c2")).as("c1"))
    val vocab = vocabTokens(reference, refTextCol)
      .agg(count_distinct(col("w")).as("v"))

    val tgt = bigrams(target, Seq(col(idCol).as("id")), textCol)
      .select(col("id"), explode_outer(col("bg")).as("p"))
    val scored = tgt
      .join(c2, tgt("p.w1") === c2("w1") && tgt("p.w2") === c2("w2"), "left")
      .join(c1, tgt("p.w1") === c1("ctx"), "left")
      .crossJoin(broadcast(vocab))
      .select(col("id"), col("p"),
        // identical shape on both engines: ln((c2+1)/(c1+V)) as one
        // integer-add, one double division, one ln — then micro-nats.
        // NULL (not 0) for the no-bigram explode_outer row, so short
        // docs keep a row without a phantom transition in the sum
        when(col("p").isNotNull && col("v") === 0L,
          raise_error(lit("empty reference corpus — vocab size is 0; " +
            "add-one scoring needs a tokenized reference")))
        .when(col("p").isNotNull,
          round(log((coalesce(col("c2"), lit(0L)) + lit(1L)).cast("double") /
            (coalesce(col("c1"), lit(0L)) + col("v"))) * lit(1000000.0))
            .cast("long")).as("lp"))
      .groupBy(col("id"))
      .agg(count(col("p")).as("n_scored"),
        coalesce(sum(col("lp")), lit(0L)).as("logprob_fp6"))
    scored.select(col("id").as(idCol), col("n_scored"), col("logprob_fp6"))
  }

  /** KNESER-NEY smoothed bigram perplexity (Kneser & Ney 1995; the
    * interpolated form of Chen & Goodman 1998 — the smoothing KenLM
    * ships and CCNet's reference LM actually uses, beside
    * [[scoreBigram]]'s add-one baseline):
    *
    *   p(w2|w1) = max(c(w1,w2) − D, 0)/c(w1) + λ(w1)·p_cont(w2)
    *   λ(w1)    = D · N1+(w1,·)/c(w1)
    *
    * where N1+(w1,·) counts DISTINCT continuations of w1 and the
    * continuation distribution ranks w2 by how many DISTINCT contexts
    * precede it — the published insight add-one cannot express: a word
    * frequent after only one context ("francisco") scores low in a new
    * context, while a modest word seen after many contexts ("york")
    * scores high. The spec pins the resulting rank INVERSION vs
    * [[scoreBigram]] on exactly that fixture.
    *
    * Two documented deviations keep scoring total and exactly hashable:
    *   - p_cont is add-one smoothed over the N1+(·,·) mass:
    *     p_cont(w2) = (N1+(·,w2) + 1)/(B + V) with B = distinct bigrams,
    *     V = vocab size — still sums to 1 over the vocabulary (Σ N1+ =
    *     B), and OOV words take the 1/(B+V) floor instead of ln(0).
    *   - an UNSEEN context scores the bare p_cont(w2) (the no-history
    *     backoff), again total.
    *
    * Determinism (the t48 discipline): the discount is the RATIONAL
    * Dn/Dd (default 3/4 — Chen & Goodman's standard absolute discount),
    * every count expression stays exact BIGINT (max(c2·Dd − Dn, 0),
    * Dd·c1, Dn·N1f, N1r+1, B+V — none can overflow a long at any corpus
    * a long can count), and the probability lowers to double in ONE
    * pinned op sequence — two correctly-rounded divisions and one add —
    * before the single ln and the 1e-6 fixed-point rounding, so the
    * oracle replays the arithmetic bit for bit. Per-doc sums are BIGINT
    * micro-nats: partition- and join-order-independent.
    *
    * Distributed shape: identical to [[scoreBigram]] plus one rollup —
    * c1 and N1f come from ONE groupBy of the persisted bigram counts,
    * N1r from another (both vocab-scale, map-side combined), totals are
    * two 1-row aggregates broadcast to the scoring join.
    *
    * @return (idCol, n_scored, logprob_fp6) — [[scoreBigram]]'s contract
    */
  def scoreKneserNey(reference: DataFrame, refTextCol: String,
      target: DataFrame, idCol: String, textCol: String,
      discountNum: Long = 3L, discountDen: Long = 4L): DataFrame = {
    require(discountNum > 0 && discountNum < discountDen && discountDen <= 1000,
      s"discount must be a rational in (0,1) with denominator <= 1000, " +
        s"got $discountNum/$discountDen")
    val dn = lit(discountNum)
    val dd = lit(discountDen)
    // the pinned op order (mirrored verbatim in the oracle SQL):
    //   known ctx:  max(c2·Dd − Dn, 0)/ (Dd·c1)
    //             + (Dn·n1f)·(n1r+1) / ((Dd·c1)·(B+V))
    //   unseen ctx: (n1r+1)/(B+V)
    knScaffold(reference, refTextCol, target, idCol, textCol,
      // c1 (context token count) and N1+(w1,·) from ONE rollup of c2
      cnAggs = Seq(sum(col("c2")).as("c1"), count(lit(1)).as("n1f")),
      pFor = { _ =>
        val (contNum, contDen) = contTerms
        when(col("c1").isNull, contNum / contDen)
          .otherwise(
            greatest(coalesce(col("c2"), lit(0L)) * dd - dn, lit(0L)).cast("double") /
              (dd * col("c1")).cast("double") +
            ((dn * col("n1f")).cast("double") * contNum) /
              ((dd * col("c1")).cast("double") * contDen))
      })
  }

  /** MODIFIED Kneser-Ney (Chen & Goodman 1998 §3 — the three-discount
    * variant that is SRILM's and KenLM's default smoothing, completing
    * the family beside [[scoreBigram]] (add-one) and [[scoreKneserNey]]
    * (single absolute discount)): bigrams seen once, twice, and three-
    * or-more times take DIFFERENT discounts, each estimated from the
    * count-of-count statistics n1..n4 (the number of bigram TYPES seen
    * exactly 1..4 times):
    *
    *   Y  = n1/(n1 + 2·n2)
    *   D1 = 1 − 2·Y·n2/n1  (= Y exactly, after simplification)
    *   D2 = 2 − 3·Y·n3/n2
    *   D3+ = 3 − 4·Y·n4/n3
    *   λ(w1) = (D1·N1(w1) + D2·N2(w1) + D3+·N3+(w1)) / c(w1)
    *
    * with Ni(w1) = #continuation types of w1 seen exactly i times
    * (N3+ = at least 3). The continuation distribution and both backoff
    * paths are [[scoreKneserNey]]'s (documented add-one-smoothed p_cont
    * keeps scoring total).
    *
    * Determinism: each discount is an exact RATIONAL of n1..n4 — the
    * numerators/denominators stay BigInt, the value rounds HALF-UP to
    * thousandths (the [[estimateDiscount]] convention), clamps into
    * [1, 999] for D1 and [1, 1000·i] for D2/D3+ (above: D1 must stay
    * strictly inside (0,1) for singleton mass to survive, and a D2/D3+
    * exceeding its bucket's count would leave negative mass — the
    * max(·,0) scorer guard makes that belt-and-braces; below: a zero
    * discount would zero λ for contexts whose continuations all sit in
    * the bucket and send an unseen-bigram probability to exact 0 —
    * ln(0)), and an EMPTY bucket
    * (n2 = 0 or n3 = 0 globally — then no bigram has that count, the
    * discount is never consulted, and its λ term multiplies a zero Ni)
    * pins to 0. The per-transition
    * probability is then the t86 pattern verbatim with 1000 as the
    * denominator scale:
    *
    *   known ctx:  max(c2·1000 − d(c2), 0)/(1000·c1)
    *             + (d1·N1 + d2·N2 + d3·N3+)·(n1r+1) / ((1000·c1)·(B+V))
    *   unseen ctx: (n1r+1)/(B+V)
    *
    * — exact BIGINT integer expressions, two correctly-rounded double
    * divisions + one add in pinned order, one ln, micro-nat sums. The
    * count-of-count fold (n1..n4) is the only addition to
    * [[scoreKneserNey]]'s shape: a second 1-row aggregate over the
    * persisted bigram counts, collected count-scale to compute the
    * three discount constants, which then ride the plan as literals.
    *
    * @return (idCol, n_scored, logprob_fp6) — [[scoreBigram]]'s contract
    */
  def scoreModifiedKneserNey(reference: DataFrame, refTextCol: String,
      target: DataFrame, idCol: String, textCol: String): DataFrame =
    knScaffold(reference, refTextCol, target, idCol, textCol,
      // per-context rollup: token count c1 and the three bucketed
      // continuation-type counts the λ numerator needs
      cnAggs = Seq(
        sum(col("c2")).as("c1"),
        sum(when(col("c2") === 1, 1L).otherwise(0L)).as("nc1"),
        sum(when(col("c2") === 2, 1L).otherwise(0L)).as("nc2"),
        sum(when(col("c2") >= 3, 1L).otherwise(0L)).as("nc3p")),
      pFor = { c2 =>
    // count-of-counts: one 1-row fold over the (vocab-scale) type counts
    val nn = c2.agg(
      sum(when(col("c2") === 1, 1L).otherwise(0L)).as("n1"),
      sum(when(col("c2") === 2, 1L).otherwise(0L)).as("n2"),
      sum(when(col("c2") === 3, 1L).otherwise(0L)).as("n3"),
      sum(when(col("c2") === 4, 1L).otherwise(0L)).as("n4"),
      sum(when(col("c2") >= 3, 1L).otherwise(0L)).as("n3p")).collect()(0)
    // SUM over an EMPTY frame is NULL — read defensively so a bigram-less
    // reference reaches the loud require below instead of an NPE
    def nl(i: Int): Long = if (nn.isNullAt(i)) 0L else nn.getLong(i)
    val (n1, n2, n3, n4, n3p) = (nl(0), nl(1), nl(2), nl(3), nl(4))
    require(n1 > 0,
      "no singleton bigrams in the reference — the count-of-count " +
        "discount estimates are undefined; use scoreKneserNey with an " +
        "explicit discount")
    val (d1, d2, d3) = modifiedDiscounts(n1, n2, n3, n4, n3p)
    val dc1 = lit(d1); val dc2 = lit(d2); val dc3 = lit(d3)
    val cc = coalesce(col("c2"), lit(0L))
    val disc = when(cc === 0L, lit(0L))
      .when(cc === 1L, dc1).when(cc === 2L, dc2).otherwise(dc3)
    val (contNum, contDen) = contTerms
    when(col("c1").isNull, contNum / contDen)
      .otherwise(
        greatest(cc * lit(1000L) - disc, lit(0L)).cast("double") /
          (lit(1000L) * col("c1")).cast("double") +
        ((dc1 * col("nc1") + dc2 * col("nc2") + dc3 * col("nc3p")).cast("double") *
          contNum) /
          ((lit(1000L) * col("c1")).cast("double") * contDen))
      })

  /** Half-up rounding of num/den to thousandths (num ≥ 0, den > 0) —
    * the ONE rounding convention every discount in the file uses. */
  private def rhuThousandths(num: BigInt, den: BigInt): Long =
    ((BigInt(2000) * num + den) / (2 * den)).toLong

  /** Thousandths of num/den clamped into [1, hi]; non-positive → 1. */
  private def clampThousandths(num: BigInt, den: BigInt, hi: Long): Long =
    if (num <= 0) 1L else math.max(1L, math.min(hi, rhuThousandths(num, den)))

  /** The three modified-KN discounts as thousandths, exact-rational then
    * half-up rounded, clamped into [1, 999] (D1) / [1, 1000·i] (D2/D3+) for a NONEMPTY bucket and
    * pinned to 0 for an empty one (then no bigram has that count, so the
    * discount is never consulted and its λ term multiplies a zero Ni).
    * The minimum of one thousandth is load-bearing, found by the t88
    * oracle at sf0.01: a negative Chen-Goodman estimate clamped to ZERO
    * would zero λ for any context whose continuation types all sit in
    * that bucket, making an unseen-bigram probability exactly 0 —
    * ln(0), which Spark's `log` nulls SILENTLY (dropping the transition
    * from the micro-nat sum) and DuckDB refuses loudly. Exposed for the
    * spec and the oracle parity argument. */
  private[graft] def modifiedDiscounts(
      n1: Long, n2: Long, n3: Long, n4: Long, n3p: Long): (Long, Long, Long) = {
    def clampRat(num: BigInt, den: BigInt, hi: Long): Long =
      clampThousandths(num, den, hi)
    val y = BigInt(n1) + 2 * BigInt(n2) // D1 = n1/(n1+2n2), exactly Y
    val d1 = clampRat(BigInt(n1), y, 999L)
    // d2's bucket is EXACT (count == 2): n2 = 0 means it is empty
    val d2 = if (n2 == 0) 0L
      else clampRat(2 * y * n2 - 3 * BigInt(n1) * n3, y * n2, 2000L)
    // d3's bucket is OPEN-ENDED (count >= 3): emptiness is n3p = 0, NOT
    // n3 = 0 — a corpus with count-4 types but no count-3 type (the t88
    // oracle found one at sf0.01) still consults d3. When the Chen-
    // Goodman estimate is undefined there (n3 = 0 divides by zero), fall
    // back to the nearest defined lower discount (d2, else d1) —
    // documented, deterministic, and mirrored in the oracle SQL.
    val d3 =
      if (n3p == 0) 0L
      else if (n3 == 0) { if (n2 > 0) d2 else d1 }
      else clampRat(3 * y * n3 - 4 * BigInt(n1) * n4, y * n3, 3000L)
    (d1, d2, d3)
  }

  /** TRIGRAM recursive Kneser-Ney (the order-3 interpolated model of
    * Chen & Goodman 1998 — what a production KenLM actually scores
    * with, completing the family's RECURSION beside the bigram
    * [[scoreKneserNey]]): the trigram level discounts and interpolates
    * into a bigram CONTINUATION model built from ADJUSTED counts — the
    * defining KN property at order 3 is that the lower order counts
    * distinct extending contexts, not raw occurrences:
    *
    *   p3(w3|w1w2) = max(c3 − D, 0)/c12 + D·N1+(w1w2·)/c12 · p2(w3|w2)
    *   p2(w3|w2)   = max(c′ − D, 0)/ctx′ + D·N1+′(w2·)/ctx′ · p_cont(w3)
    *   c′(w2,w3)   = |{w1 : c3(w1w2w3) > 0}|   (adjusted count)
    *
    * with ctx′(w2) = Σ_w3 c′, N1+′(w2·) = distinct w3 with c′ > 0, and
    * p_cont the add-one-smoothed unigram continuation over the adjusted
    * bigram mass (N1+(·w3)′ + 1)/(B2 + V) — the same documented
    * totality convention as [[scoreKneserNey]]. c12 is Σ_w3 c3 (the
    * continuation-consistent context mass, so each level is a proper
    * distribution over the vocabulary). Backoff paths: unseen (w1,w2)
    * context → p2; unseen w2 entirely → p_cont; every path is strictly
    * positive, so ln never sees 0.
    *
    * Determinism: the t86 discipline at BOTH levels — the rational
    * discount Dn/Dd stays exact BIGINT in every count expression, each
    * level lowers to double in ONE pinned sequence (two divisions + an
    * add at level 2; a division, a multiply by the level-2 value, and
    * an add at level 3), one ln, micro-nat BIGINT sums. The oracle
    * replays the nested CASE arithmetic op for op.
    *
    * Distributed shape: trigram type counts persist once; c12, the
    * adjusted-count frame c′ (persisted — it feeds three rollups and
    * the scoring join), ctx′, and the continuation counts are all
    * vocab-scale map-side-combined rollups of those two frames; totals
    * are two 1-row folds broadcast to the 5-way scoring join. Does NOT
    * share [[knScaffold]]: the join tree is trigram-keyed with two
    * model levels, a genuinely different shape.
    *
    * @return (idCol, n_scored, logprob_fp6) — n_scored counts TRIGRAM
    *         transitions (tokens − 2); docs under 3 tokens carry 0 */
  def scoreKneserNeyTrigram(reference: DataFrame, refTextCol: String,
      target: DataFrame, idCol: String, textCol: String,
      discountNum: Long = 3L, discountDen: Long = 4L): DataFrame = {
    require(discountNum > 0 && discountNum < discountDen && discountDen <= 1000,
      s"discount must be a rational in (0,1) with denominator <= 1000, " +
        s"got $discountNum/$discountDen")
    val dn = lit(discountNum)
    val dd = lit(discountDen)
    kn3Scaffold(reference, refTextCol, target, idCol, textCol,
      c12Aggs = Seq(sum(col("c3")).as("c12"), count(lit(1)).as("n3f")),
      ctx2Aggs = Seq(sum(col("cp")).as("ctx2"), count(lit(1)).as("n2f")),
      pFor = { (_, _) =>
        val (contNum, contDen) = contTerms3
        val p2 = when(col("ctx2").isNull, contNum / contDen)
          .otherwise(
            greatest(coalesce(col("cp"), lit(0L)) * dd - dn, lit(0L)).cast("double") /
              (dd * col("ctx2")).cast("double") +
            ((dn * col("n2f")).cast("double") * contNum) /
              ((dd * col("ctx2")).cast("double") * contDen))
        val p3 =
          greatest(coalesce(col("c3"), lit(0L)) * dd - dn, lit(0L)).cast("double") /
            (dd * col("c12")).cast("double") +
          ((dn * col("n3f")).cast("double") / (dd * col("c12")).cast("double")) * p2
        (p2, p3)
      })
  }

  /** The add-one-smoothed unigram continuation shared by the order-3
    * family: ((n1rc + 1)/(B2 + V)) as (numerator, denominator) doubles
    * in the pinned cast order. */
  private def contTerms3: (org.apache.spark.sql.Column, org.apache.spark.sql.Column) =
    ((coalesce(col("n1rc"), lit(0L)) + lit(1L)).cast("double"),
      (col("b2") + col("v")).cast("double"))

  /** Shared scaffold of the ORDER-3 Kneser-Ney family
    * ([[scoreKneserNeyTrigram]], [[scoreModifiedKneserNeyTrigram]]) —
    * the [[knScaffold]] discipline one order up: persisted trigram type
    * counts, the caller-shaped (w1,w2) rollup, the persisted ADJUSTED
    * bigram counts c′ (distinct extending w1 — the defining KN
    * recursion), the caller-shaped w2 rollup, continuation counts, the
    * B2/V totals broadcast, the 5-way scoring join, and the micro-nat
    * reduce. `pFor` receives the persisted c3 and c′ frames (modified
    * KN folds each order's count-of-counts over them) and returns
    * (p2, p3) over the post-join names; the scaffold owns the backoff
    * CASE (unseen (w1,w2) → p2; the B2+V=0 loud guard). */
  private def kn3Scaffold(reference: DataFrame, refTextCol: String,
      target: DataFrame, idCol: String, textCol: String,
      c12Aggs: Seq[org.apache.spark.sql.Column],
      ctx2Aggs: Seq[org.apache.spark.sql.Column],
      pFor: (DataFrame, DataFrame) =>
        (org.apache.spark.sql.Column, org.apache.spark.sql.Column)): DataFrame = {

    // r18: native n-gram struct stream — see [[bigrams]]; replaces the
    // doubly-interpreted nested zip_with.
    def trigrams(df: DataFrame,
        cols: Seq[org.apache.spark.sql.Column], tc: String) =
      df.select(cols :+
        graft.functions.expr.WordNgramStructs(col(tc), 3).as("tg"): _*)

    val refT = explodedRef(trigrams(reference, Seq.empty, refTextCol), "tg")
    val c3 = graft.engine.BoundedCaches.persist(
      refT.groupBy(col("p.w1").as("w1"), col("p.w2").as("w2"), col("p.w3").as("w3"))
        .agg(count(lit(1)).as("c3")))
    // trigram context mass + the caller's per-(w1,w2) extras, ONE rollup
    val c12 = c3.groupBy(col("w1").as("cw1"), col("w2").as("cw2"))
      .agg(c12Aggs.head, c12Aggs.tail: _*)
    // the ADJUSTED bigram counts: c′(w2,w3) = distinct w1 — persisted,
    // it feeds three rollups (ctx2, nrc, the b2 total) and the scoring join
    val cp = graft.engine.BoundedCaches.persist(
      c3.groupBy(col("w2").as("bw2"), col("w3").as("bw3"))
        .agg(count(lit(1)).as("cp")))
    val ctx2 = cp.groupBy(col("bw2").as("xw2"))
      .agg(ctx2Aggs.head, ctx2Aggs.tail: _*)
    val nrc = cp.groupBy(col("bw3").as("rw3")).agg(count(lit(1)).as("n1rc"))
    val tot = cp.agg(count(lit(1)).as("b2")).crossJoin(
      vocabTokens(reference, refTextCol)
        .agg(count_distinct(col("w")).as("v")))

    val tgt = trigrams(target, Seq(col(idCol).as("id")), textCol)
      .select(col("id"), explode_outer(col("tg")).as("p"))
    val (p2, p3) = pFor(c3, cp)
    // same degenerate-reference guard as knScaffold (B2+V = 0 →
    // Infinity → silent Long.MaxValue); lazy branch, green path unchanged
    val p = when((col("b2") + col("v")) === 0L,
        raise_error(lit("empty reference corpus — B2+V is 0; the " +
          "Kneser-Ney family needs a tokenized reference")))
      .when(col("c12").isNull, p2)
      .otherwise(p3)
    val scored = tgt
      .join(c3, tgt("p.w1") === c3("w1") && tgt("p.w2") === c3("w2") &&
        tgt("p.w3") === c3("w3"), "left")
      .join(c12, tgt("p.w1") === col("cw1") && tgt("p.w2") === col("cw2"), "left")
      .join(cp, tgt("p.w2") === col("bw2") && tgt("p.w3") === col("bw3"), "left")
      .join(ctx2, tgt("p.w2") === col("xw2"), "left")
      .join(nrc, tgt("p.w3") === col("rw3"), "left")
      .crossJoin(broadcast(tot))
      .select(col("id"), col("p"),
        when(col("p").isNotNull,
          round(log(p) * lit(1000000.0)).cast("long")).as("lp"))
      .groupBy(col("id"))
      .agg(count(col("p")).as("n_scored"),
        coalesce(sum(col("lp")), lit(0L)).as("logprob_fp6"))
    scored.select(col("id").as(idCol), col("n_scored"), col("logprob_fp6"))
  }

  /** TRIGRAM MODIFIED Kneser-Ney — the actual SRILM/KenLM DEFAULT: the
    * Chen & Goodman three-discount estimate at EVERY order of
    * [[scoreKneserNeyTrigram]]'s recursion. Each order estimates its own
    * (D1, D2, D3+) from ITS OWN count-of-count statistics — the trigram
    * level from n1..n4 over the raw trigram type counts c3, the bigram
    * continuation level from n1..n4 over the ADJUSTED counts c′ (the
    * order-k discounts in Chen & Goodman §3 are functions of order-k
    * counts, and at the continuation level those are the adjusted
    * counts — discounting raw-count statistics there would mix the two
    * distributions):
    *
    *   p3(w3|w1w2) = max(c3·1000 − d₃(c3), 0)/(1000·c12)
    *               + (d₃1·N1 + d₃2·N2 + d₃3·N3+)(w1w2)/(1000·c12) · p2(w3|w2)
    *   p2(w3|w2)   = max(c′·1000 − d₂(c′), 0)/(1000·ctx′)
    *               + (d₂1·N′1 + d₂2·N′2 + d₂3·N′3+)(w2)/(1000·ctx′) · p_cont(w3)
    *
    * with Ni(w1w2)/N′i(w2) the per-context continuation types seen
    * exactly i times (≥3 for the open bucket) at that order, p_cont the
    * add-one continuation over the adjusted bigram mass, and both
    * backoff paths [[scoreKneserNeyTrigram]]'s. Discounts reuse
    * [[modifiedDiscounts]] VERBATIM (thousandths, half-up, the
    * empty-bucket pin, the open-bucket d3→d2→d1 fallback, the
    * [1,999]/[1,1000·i] clamps); each order's count-of-count fold is a
    * 1-row collect over a persisted vocab-scale frame (count-scale, the
    * t88 shape), and the six discount constants ride the plan as
    * literals. Arithmetic discipline is t88's at both levels: exact
    * BIGINT count expressions, one pinned double sequence per level,
    * one ln, micro-nat BIGINT sums.
    *
    * @return (idCol, n_scored, logprob_fp6) — [[scoreKneserNeyTrigram]]'s
    *         contract (n_scored counts trigram transitions)
    */
  def scoreModifiedKneserNeyTrigram(reference: DataFrame, refTextCol: String,
      target: DataFrame, idCol: String, textCol: String): DataFrame = {
    val bucketAggs = (cnt: String, pre: String) => Seq(
      sum(when(col(cnt) === 1, 1L).otherwise(0L)).as(pre + "1"),
      sum(when(col(cnt) === 2, 1L).otherwise(0L)).as(pre + "2"),
      sum(when(col(cnt) >= 3, 1L).otherwise(0L)).as(pre + "3p"))
    kn3Scaffold(reference, refTextCol, target, idCol, textCol,
      c12Aggs = sum(col("c3")).as("c12") +: bucketAggs("c3", "nc"),
      ctx2Aggs = sum(col("cp")).as("ctx2") +: bucketAggs("cp", "mc"),
      pFor = { (c3, cp) =>
        // one count-of-count fold PER ORDER, each over its own persisted
        // type-count frame (1-row collects — count-scale, the t88 shape)
        def countOfCounts(df: DataFrame, cnt: String, order: String) = {
          val nn = df.agg(
            sum(when(col(cnt) === 1, 1L).otherwise(0L)).as("n1"),
            sum(when(col(cnt) === 2, 1L).otherwise(0L)).as("n2"),
            sum(when(col(cnt) === 3, 1L).otherwise(0L)).as("n3"),
            sum(when(col(cnt) === 4, 1L).otherwise(0L)).as("n4"),
            sum(when(col(cnt) >= 3, 1L).otherwise(0L)).as("n3p")).collect()(0)
          def nl(i: Int): Long = if (nn.isNullAt(i)) 0L else nn.getLong(i)
          require(nl(0) > 0,
            s"no singleton $order types in the reference — the " +
              "count-of-count discount estimates are undefined; use " +
              "scoreKneserNeyTrigram with an explicit discount")
          modifiedDiscounts(nl(0), nl(1), nl(2), nl(3), nl(4))
        }
        val (e1, e2, e3) = countOfCounts(c3, "c3", "trigram")
        val (f1, f2, f3) = countOfCounts(cp, "cp", "adjusted-bigram")
        val (de1, de2, de3) = (lit(e1), lit(e2), lit(e3))
        val (df1, df2, df3) = (lit(f1), lit(f2), lit(f3))
        val (contNum, contDen) = contTerms3
        val cpp = coalesce(col("cp"), lit(0L))
        val disc2 = when(cpp === 0L, lit(0L))
          .when(cpp === 1L, df1).when(cpp === 2L, df2).otherwise(df3)
        val p2 = when(col("ctx2").isNull, contNum / contDen)
          .otherwise(
            greatest(cpp * lit(1000L) - disc2, lit(0L)).cast("double") /
              (lit(1000L) * col("ctx2")).cast("double") +
            ((df1 * col("mc1") + df2 * col("mc2") + df3 * col("mc3p")).cast("double") *
              contNum) /
              ((lit(1000L) * col("ctx2")).cast("double") * contDen))
        val c3c = coalesce(col("c3"), lit(0L))
        val disc3 = when(c3c === 0L, lit(0L))
          .when(c3c === 1L, de1).when(c3c === 2L, de2).otherwise(de3)
        val p3 =
          greatest(c3c * lit(1000L) - disc3, lit(0L)).cast("double") /
            (lit(1000L) * col("c12")).cast("double") +
          ((de1 * col("nc1") + de2 * col("nc2") + de3 * col("nc3p")).cast("double") /
            (lit(1000L) * col("c12")).cast("double")) * p2
        (p2, p3)
      })
  }

  /** ORDER-N MODIFIED Kneser-Ney — [[scoreModifiedKneserNeyTrigram]]'s
    * recursion generalized to any order (KenLM's production DEFAULT is
    * order 5, the shape CCNet's published filter actually trains;
    * Wenzek et al. 2020 §4.1 / Chen & Goodman 1998 §3). Level N holds
    * the raw n-gram type counts; every level below holds ADJUSTED
    * counts — the count of DISTINCT one-word-longer contexts, the
    * defining KN recursion applied N−2 times:
    *
    *   a_{k}(w_{N−k+1}..w_N) = |{w_{N−k} : a_{k+1}(w_{N−k}..w_N) > 0}|
    *
    * (a_N = raw counts). Each level k estimates its OWN three discounts
    * from ITS OWN count-of-counts over a_k ([[modifiedDiscounts]]
    * verbatim: thousandths, half-up, empty-bucket pin, open-bucket
    * fallback, the [1,999]/[1,1000·i] clamps), and interpolates:
    *
    *   p_k = max(a_k·1000 − d_k(a_k), 0)/(1000·ctx_k)
    *       + (d_k1·N1 + d_k2·N2 + d_k3·N3+)(ctx)/(1000·ctx_k) · p_{k−1}
    *
    * down to the add-one unigram continuation p_cont(w_N) =
    * (N1+(·w_N)+1)/(B+V) over the level-2 adjusted mass. Backoff at
    * every level: unseen context → the level below, so every path stays
    * strictly positive and ln never sees 0.
    *
    * Arithmetic discipline is t91's, made UNIFORM across levels: exact
    * BIGINT count expressions; per level ONE pinned double sequence —
    * discounted-mass division, λ division, one multiply by the level
    * below, one add — then one ln and micro-nat BIGINT sums, so the
    * oracle replays the chain level by level (a linear CTE chain, not
    * the exponentially-nested CASE the order-3 oracle could still
    * afford). NOTE the level-2 λ term is (λ/(1000·ctx))·p_cont here,
    * algebraically equal to t88/t91's fused (λ·contNum)/((1000·ctx)·
    * contDen) but NOT bit-identical — a deliberate, documented shape
    * difference confined to this entry point (its own oracle replays
    * the uniform shape; the t88/t91 oracles pin theirs).
    *
    * Distributed shape: N−1 persisted type-count frames (each feeds the
    * next rollup, its ctx rollup, a 1-row count-of-count fold, and the
    * scoring join), vocab-scale ctx/continuation rollups (map-side
    * combined), two 1-row totals broadcast, one (2N−1)-way scoring
    * join. The 3·(N−1) discount constants ride the plan as literals —
    * the construct-time-snapshot doctrine ([[graft.operators
    * .GroupedRank]]).
    *
    * @return (idCol, n_scored, logprob_fp6) — n_scored counts order-N
    *         transitions (tokens − N + 1); docs under N tokens carry 0
    */
  def scoreModifiedKneserNeyOrderN(reference: DataFrame, refTextCol: String,
      target: DataFrame, idCol: String, textCol: String,
      order: Int): DataFrame = {
    require(order >= 3 && order <= 8,
      s"order must be in [3, 8], got $order (order 2 is " +
        "scoreModifiedKneserNey; above 8 the count frames stop paying " +
        "for their sparsity)")
    val N = order

    // r18: native one-pass n-gram struct stream — replaces the
    // interpreted transform(sequence)+element_at formulation (lambda
    // dispatch + element_at per position per word; see [[bigrams]]).
    def ngrams(df: DataFrame, cols: Seq[org.apache.spark.sql.Column],
        tc: String) =
      df.select(cols :+
        graft.functions.expr.WordNgramStructs(col(tc), N).as("ng"): _*)

    val refNg = explodedRef(ngrams(reference, Seq.empty, refTextCol), "ng")
    // level N: raw type counts, key (w1..wN); levels N−1..2: adjusted
    // counts, each a count(1) rollup of the level above (every row of the
    // upper frame IS a distinct extension)
    val frames = scala.collection.mutable.Map[Int, DataFrame](
      N -> graft.engine.BoundedCaches.persist(
        refNg.groupBy((1 to N).map(k => col(s"p.w$k").as(s"w$k")): _*)
          .agg(count(lit(1)).as("cnt"))))
    for (k <- (N - 1) to 2 by -1)
      frames(k) = graft.engine.BoundedCaches.persist(
        frames(k + 1).groupBy(((N - k + 1) to N).map(j => col(s"w$j")): _*)
          .agg(count(lit(1)).as("cnt")))

    // per-level context rollup: drop the last key word; carries the mass
    // and the three bucketed continuation-type counts the λ numerator needs
    val ctxFrames = (2 to N).map { k =>
      val ctxKeys = (N - k + 1) to (N - 1)
      k -> frames(k)
        .groupBy(ctxKeys.map(j => col(s"w$j").as(s"x${k}_w$j")): _*)
        .agg(sum(col("cnt")).as(s"ctx$k"),
          sum(when(col("cnt") === 1, 1L).otherwise(0L)).as(s"b${k}_1"),
          sum(when(col("cnt") === 2, 1L).otherwise(0L)).as(s"b${k}_2"),
          sum(when(col("cnt") >= 3, 1L).otherwise(0L)).as(s"b${k}_3p"))
    }.toMap

    val nrc = frames(2).groupBy(col(s"w$N").as("rwN"))
      .agg(count(lit(1)).as("n1rc"))
    val tot = frames(2).agg(count(lit(1)).as("b2")).crossJoin(
      vocabTokens(reference, refTextCol)
        .agg(count_distinct(col("w")).as("v")))

    // one count-of-count fold PER LEVEL, each over its own persisted
    // type-count frame (1-row collects — count-scale, the t88 shape)
    val discs: Map[Int, (Long, Long, Long)] = (2 to N).map { k =>
      val nn = frames(k).agg(
        sum(when(col("cnt") === 1, 1L).otherwise(0L)).as("n1"),
        sum(when(col("cnt") === 2, 1L).otherwise(0L)).as("n2"),
        sum(when(col("cnt") === 3, 1L).otherwise(0L)).as("n3"),
        sum(when(col("cnt") === 4, 1L).otherwise(0L)).as("n4"),
        sum(when(col("cnt") >= 3, 1L).otherwise(0L)).as("n3p")).collect()(0)
      def nl(i: Int): Long = if (nn.isNullAt(i)) 0L else nn.getLong(i)
      require(nl(0) > 0,
        s"no singleton level-$k types in the reference — the " +
          "count-of-count discount estimates are undefined; lower the " +
          "order or use scoreKneserNeyTrigram with an explicit discount")
      k -> modifiedDiscounts(nl(0), nl(1), nl(2), nl(3), nl(4))
    }.toMap

    val tgt = ngrams(target, Seq(col(idCol).as("id")), textCol)
      .select(col("id"), explode_outer(col("ng")).as("p"))
    var joined = tgt
    for (k <- N to 2 by -1) {
      val keys = (N - k + 1) to N
      val fr = frames(k).select(
        keys.map(j => col(s"w$j").as(s"k${k}_w$j")) :+
          col("cnt").as(s"cnt$k"): _*)
      joined = joined.join(fr,
        keys.map(j => tgt(s"p.w$j") === fr(s"k${k}_w$j")).reduce(_ && _),
        "left")
    }
    for (k <- N to 2 by -1) {
      val ctxKeys = (N - k + 1) to (N - 1)
      val cf = ctxFrames(k)
      joined = joined.join(cf,
        ctxKeys.map(j => tgt(s"p.w$j") === cf(s"x${k}_w$j")).reduce(_ && _),
        "left")
    }
    joined = joined
      .join(nrc, tgt(s"p.w$N") === nrc("rwN"), "left")
      .crossJoin(broadcast(tot))

    def discFor(k: Int, cnt: org.apache.spark.sql.Column) = {
      val (d1, d2, d3) = discs(k)
      when(cnt === 0L, lit(0L)).when(cnt === 1L, lit(d1))
        .when(cnt === 2L, lit(d2)).otherwise(lit(d3))
    }
    def lambdaNum(k: Int) = {
      val (d1, d2, d3) = discs(k)
      lit(d1) * col(s"b${k}_1") + lit(d2) * col(s"b${k}_2") +
        lit(d3) * col(s"b${k}_3p")
    }
    // the uniform per-level double sequence, folded from p_cont upward;
    // each level's backoff (unseen context → level below) is a lazy
    // CaseWhen branch
    var p: org.apache.spark.sql.Column =
      (coalesce(col("n1rc"), lit(0L)) + lit(1L)).cast("double") /
        (col("b2") + col("v")).cast("double")
    for (k <- 2 to N) {
      val ck = coalesce(col(s"cnt$k"), lit(0L))
      val pk =
        greatest(ck * lit(1000L) - discFor(k, ck), lit(0L)).cast("double") /
          (lit(1000L) * col(s"ctx$k")).cast("double") +
        (lambdaNum(k).cast("double") /
          (lit(1000L) * col(s"ctx$k")).cast("double")) * p
      p = when(col(s"ctx$k").isNull, p).otherwise(pk)
    }
    // same degenerate-reference guard as the rest of the family (B+V = 0
    // → Infinity → silent Long.MaxValue); lazy branch, green path unchanged
    val pAll = when((col("b2") + col("v")) === 0L,
        raise_error(lit("empty reference corpus — B+V is 0; the " +
          "Kneser-Ney family needs a tokenized reference")))
      .otherwise(p)
    val scored = joined
      .select(col("id"), col("p"),
        when(col("p").isNotNull,
          round(log(pAll) * lit(1000000.0)).cast("long")).as("lp"))
      .groupBy(col("id"))
      .agg(count(col("p")).as("n_scored"),
        coalesce(sum(col("lp")), lit(0L)).as("logprob_fp6"))
    scored.select(col("id").as(idCol), col("n_scored"), col("logprob_fp6"))
  }

  /** CCNet head/middle/tail PERPLEXITY BUCKETING (Wenzek et al. 2020
    * §4.3 — the published pipeline's headline mechanism: per language,
    * order documents by reference-LM perplexity and cut into thirds;
    * "head" is the training-data keep set, "tail" the discard).
    *
    * Input is a scored frame carrying (idCol, langCol, n_scored,
    * logprob_fp6) — [[scoreBigram]]/[[scoreKneserNey]] output joined
    * with its language column. Ordering key is the per-transition
    * log-prob logprob_fp6/n_scored DESC (higher = cleaner = head),
    * ONE double division computed identically on both engines, doc-id
    * tiebreak; the cut is EXACT integer rank arithmetic,
    * bucket = (3·(rank−1)) div n_lang — no quantile sketch in the gate
    * hash. Docs with no scored transition take 'unscored' (CCNet drops
    * them before bucketing; keeping the row makes the operator total).
    *
    * Scale: the per-language rank rides [[graft.operators.GroupedRank]]
    * — the bucketed PrefixSum doctrine, NOT a bare
    * `Window.partitionBy(lang)`: a single language dominating a 100 TB
    * corpus would make that window one sort task holding billions of
    * rows (the SinglePartition class this repo bans; the r16 verdict's
    * one weak). GroupedRank probes global key quantiles once, shuffles
    * on (lang, scored-flag, key-bucket) so no task holds more than one
    * slice, and folds ≤ languages×2×buckets slice counts on the driver
    * into broadcast offsets — rank and n_lang are EXACTLY the window
    * form's numbers (equal keys never split buckets, bucket order
    * follows scan order), so the t87 gate hash is unchanged and
    * `PerplexityBucketsSpec` pins equality against the exact-window
    * form plus the plan shape (every window partition key set includes
    * the bucket id).
    *
    * @return (idCol, langCol, n_scored, logprob_fp6, bucket) */
  def perplexityBuckets(scored: DataFrame, idCol: String,
      langCol: String): DataFrame = {
    // ONE pass, no self-join: unscored rows ride separate rank groups
    // (the n_scored > 0 flag is a group key), so the scoring subtree
    // plans exactly once — a filter + join-back here would duplicate
    // the upstream LM plan (measured: doubled the scalar-fold count in
    // the t87 audit). GroupedRank persists its input before the
    // quantile probe, so the LM subtree COMPUTES once too.
    val flag = "_ppb_scored"
    // the division is GUARDED, not bare: unscored rows take key 0.0
    // (their rank is never consulted — they bucket 'unscored'), because
    // ANSI mode evaluates the key for every row and 0/0 would throw
    val keyed = scored
      .withColumn(flag, col("n_scored") > 0)
      .withColumn("_ppb_key",
        when(col(flag), col("logprob_fp6").cast("double") / col("n_scored"))
          .otherwise(lit(0.0)))
    val ranked = graft.operators.GroupedRank.withGroupRank(
      keyed, Seq(langCol, flag), "_ppb_key", descending = true,
      tieBreak = Seq(col(idCol).asc), outRank = "_ppb_rnk",
      outCount = "_ppb_n")
    ranked
      .withColumn("_ppb_tertile", expr("(3 * (_ppb_rnk - 1)) div _ppb_n"))
      .select(col(idCol), col(langCol), col("n_scored"), col("logprob_fp6"),
        when(!col(flag), "unscored")
          .when(col("_ppb_tertile") === 0, "head")
          .when(col("_ppb_tertile") === 1, "middle")
          .otherwise("tail").as("bucket"))
  }

  /** Chen & Goodman (1998)'s estimated absolute discount for Kneser-Ney,
    * D = n1/(n1 + 2·n2) with n1/n2 = the number of bigram types seen
    * exactly once/twice in the reference — computed distributed (one
    * 1-row fold over the bigram counts) and rounded half-up to the
    * nearest thousandth, returned as a (num, 1000) rational that plugs
    * straight into [[scoreKneserNey]]'s exact-integer discount guard
    * (clamped to [1, 999]: D must stay inside (0, 1) for the discounted
    * mass to remain a probability). */
  def estimateDiscount(reference: DataFrame, refTextCol: String): (Long, Long) = {
    val refBg = explodedRef(bigrams(reference, Seq.empty, refTextCol), "bg")
    val row = refBg.groupBy(col("p.w1"), col("p.w2"))
      .agg(count(lit(1)).as("c2"))
      .agg(sum(when(col("c2") === 1, 1L).otherwise(0L)).as("n1"),
        sum(when(col("c2") === 2, 1L).otherwise(0L)).as("n2"))
      .collect()(0)
    // SUM over an EMPTY frame is NULL — reach the loud require, not an NPE
    val n1 = if (row.isNullAt(0)) 0L else row.getLong(0)
    val n2 = if (row.isNullAt(1)) 0L else row.getLong(1)
    require(n1 > 0,
      "no singleton bigrams in the reference — the Chen-Goodman estimate " +
        "is undefined; pass an explicit discount to scoreKneserNey")
    val den = BigInt(n1) + 2 * BigInt(n2)
    (clampThousandths(BigInt(n1), den, 999L), 1000L)
  }

  /** DSIR-style importance weighting for data selection (Xie et al. 2023,
    * "Data Selection for Language Models via Importance Resampling" —
    * public method): weight(x) = log p_target(x) − log p_raw(x), with
    * both densities the same add-one bigram LM over different reference
    * corpora. Positive weight ⇒ the doc looks more like the TARGET
    * distribution than the raw pool — the ranking DSIR resamples by.
    *
    * Weights are BIGINT micro-nat differences of [[scoreBigram]] outputs,
    * so they inherit its partitioning-independence; `selected` is the
    * shuffle-free sign rule (weight > 0), NOT a global top-k — a global
    * quantile cut would add an all-data rank exchange, and the sign rule
    * is the same decision at the p_target = p_raw crossover.
    *
    * The docs pool feeds BOTH scoring passes — persisted through the
    * bounded registry (the q9 multi-reference rule) so the pool scans
    * once, not twice.
    */
  def importanceWeights(
      targetRef: DataFrame, rawRef: DataFrame, refTextCol: String,
      docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val pool = graft.engine.BoundedCaches.persist(docs)
    val t = scoreBigram(targetRef, refTextCol, pool, idCol, textCol)
      .select(col(idCol), col("n_scored"), col("logprob_fp6").as("lp_target_fp6"))
    val r = scoreBigram(rawRef, refTextCol, pool, idCol, textCol)
      .select(col(idCol), col("logprob_fp6").as("lp_raw_fp6"))
    t.join(r, Seq(idCol))
      .select(col(idCol), col("n_scored"), col("lp_target_fp6"), col("lp_raw_fp6"),
        (col("lp_target_fp6") - col("lp_raw_fp6")).as("weight_fp6"),
        (col("lp_target_fp6") > col("lp_raw_fp6")).as("selected"))
  }
}
