package graft.queries

import graft.functions.Similarity
import graft.io.Tables
import org.apache.spark.sql.functions._

/** Similarity search over the `embeddings` table (array<float>, 64-dim):
  * brute-force cosine top-k as the exact baseline (oracle-checked), and
  * hyperplane-LSH ANN as the scale path (rows-only — the bucket family has
  * no DuckDB equivalent; recall vs the exact result is pinned in
  * SimilaritySpec).
  */
object SimilarityQueries {

  val DIM = 64

  val defs: Seq[QueryDef] = Seq(

    // Exact cosine top-3 neighbors per vector. Dot products fold in double,
    // left-to-right, matching DuckDB's list_dot_product evaluation; results
    // round to 6dp before ranking so rank boundaries are engine-stable.
    QueryDef.sql(
      "d5_embedding_topk",
      """WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
        |n AS (SELECT vec_id, e, sqrt(list_dot_product(e, e)) AS nrm FROM v),
        |p AS (SELECT a.vec_id AS vec_id, b.vec_id AS neighbor_id,
        |        round(list_dot_product(a.e, b.e) / (a.nrm * b.nrm), 6) AS cos
        |      FROM n a JOIN n b ON a.vec_id <> b.vec_id)
        |SELECT vec_id, neighbor_id, cos, CAST(rk AS INT) AS rk FROM (
        |  SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY cos DESC, neighbor_id) AS rk FROM p) t
        |WHERE rk <= 3""".stripMargin) { (spark, dir) =>
      Similarity.bruteForceTopKBroadcast(
        Tables.load(spark, dir, "embeddings"), "vec_id", "embedding", k = 3)
    },

    // Hard-negative mining for contrastive training: per vector, the top-3
    // most-similar vectors with a DIFFERENT label — the batch-building
    // primitive behind embedding-model training (the informative negatives
    // are the near-misses, not random draws). Same broadcast best-k
    // contract as d5 plus a per-candidate label compare; still no pair
    // materialization, no shuffle.
    QueryDef.sql(
      "d32_hard_negatives",
      """WITH v AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
        |n AS (SELECT vec_id, label, e, sqrt(list_dot_product(e, e)) AS nrm FROM v),
        |p AS (SELECT a.vec_id AS vec_id, b.vec_id AS neighbor_id,
        |        round(list_dot_product(a.e, b.e) / (a.nrm * b.nrm), 6) AS cos
        |      FROM n a JOIN n b ON a.label <> b.label)
        |SELECT vec_id, neighbor_id, cos, CAST(rk AS INT) AS rk FROM (
        |  SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY cos DESC, neighbor_id) AS rk FROM p) t
        |WHERE rk <= 3""".stripMargin) { (spark, dir) =>
      Similarity.bruteForceTopKBroadcast(
        Tables.load(spark, dir, "embeddings"), "vec_id", "embedding", k = 3,
        excludeSameLabel = Some("label"))
    },

    // ANN via 4 tables of 12 random hyperplanes: candidates share a bucket
    // in ≥1 table; exact cosine re-rank on candidates only. At scale the
    // cross join becomes 4 equi-join shuffles on 8-byte signatures.
    QueryDef.rowsOnly("d6_lsh_ann_topk") { (spark, dir) =>
      Similarity.lshTopK(
        Tables.load(spark, dir, "embeddings"), "vec_id", "embedding",
        dim = DIM, k = 3)
    },

    // IVF ANN: k-means coarse quantizer, nprobe-cell probing, exact cosine
    // re-rank inside probed cells only. The index is shuffle-partitioned by
    // cell id once; each query touches nprobe/nlist of the corpus.
    QueryDef.rowsOnly("d8_ivf_ann_topk") { (spark, dir) =>
      Similarity.ivfTopK(
        Tables.load(spark, dir, "embeddings"), "vec_id", "embedding", k = 3)
    },

    // D43: the ANN twin of d41/d42 — both approximate routes' exact-copy
    // recall THEOREMS, driver-hashed: an identical vector has an identical
    // hyperplane signature (same bucket in every LSH table) and the same
    // nearest IVF centroid (same probed cell), so a planted exact copy
    // can never be missed, and at cosine 1.0 it outranks every genuine
    // neighbor — top-1 of each original MUST be its twin on both routes.
    // The twin-id arithmetic is SQL, so the assignment itself hashes, not
    // just a count.
    QueryDef.sql(
      "d43_ann_exactdup_audit",
      """SELECT vec_id, vec_id + 1000000 AS twin_id,
        |  TRUE AS lsh_top1_is_twin, TRUE AS ivf_top1_is_twin
        |FROM embeddings WHERE vec_id < 100""".stripMargin) { (spark, dir) =>
      val vecs = Tables.load(spark, dir, "embeddings")
        .select(col("vec_id"), col("embedding"))
      val twins = vecs.filter(col("vec_id") < 100)
        .select((col("vec_id") + 1000000).as("vec_id"), col("embedding"))
      val aug = vecs.unionAll(twins)
      def top1(df: org.apache.spark.sql.DataFrame) = df
        .filter(col("rk") === 1 && col("vec_id") < 100)
        .select(col("vec_id"), col("neighbor_id"))
      val lsh = top1(Similarity.lshTopK(aug, "vec_id", "embedding", dim = DIM, k = 1))
        .withColumnRenamed("neighbor_id", "lsh_n")
      val ivf = top1(Similarity.ivfTopK(aug, "vec_id", "embedding", k = 1))
        .withColumnRenamed("neighbor_id", "ivf_n")
      lsh.join(ivf, Seq("vec_id"))
        .select(col("vec_id"), (col("vec_id") + 1000000).as("twin_id"),
          (col("lsh_n") === col("vec_id") + 1000000).as("lsh_top1_is_twin"),
          (col("ivf_n") === col("vec_id") + 1000000).as("ivf_top1_is_twin"))
    },

    // D71: bitext margin mining (Artetxe & Schwenk 2019, the CCMatrix /
    // LASER criterion — the published method for mining parallel
    // sentence pairs from two monolingual embedding spaces): a candidate
    // pair (x, y) scores margin(x,y) = cos(x,y) / ((Σ top-k cos around x
    // + Σ top-k cos around y) / 2k) — ratio to the LOCAL similarity
    // neighborhood, which kills hubness false positives a raw cosine
    // threshold admits. The two "languages" are the embedding table's
    // parity halves; per-side top-k rides d32's cross-label broadcast
    // best-k (no pair materialization). ARITHMETIC DISCIPLINE: cosines
    // are the d5 6dp-rounded doubles, converted EXACTLY to 1e-6
    // fixed-point via DECIMAL(18,6)·1e6, and the margin is emitted as an
    // exact integer numerator/denominator pair with a DIVISION-FREE
    // acceptance test (800·cos_fp ≥ 101·den ⟺ margin ≥ 1.01, guarded
    // den > 0) — no trunc-vs-floor split, no IEEE division anywhere
    // past the pinned 6dp rounding. accepted additionally requires
    // MUTUALITY (y's best is x — the published filter).
    QueryDef.sql(
      "d71_bitext_margin_mining",
      """WITH v AS (SELECT vec_id, vec_id % 2 AS side, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
        |n AS (SELECT vec_id, side, e, sqrt(list_dot_product(e, e)) AS nrm FROM v),
        |p AS (SELECT a.vec_id AS vec_id, a.side AS side, b.vec_id AS neighbor_id,
        |        CAST(CAST(round(list_dot_product(a.e, b.e) / (a.nrm * b.nrm), 6) AS DECIMAL(18,6)) * 1000000 AS BIGINT) AS cos_fp
        |      FROM n a JOIN n b ON a.side <> b.side),
        |r AS (SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY cos_fp DESC, neighbor_id) AS rk
        |      FROM p),
        |k4 AS (SELECT * FROM r WHERE rk <= 4),
        |a AS (SELECT vec_id, side, SUM(cos_fp) AS sum_top_fp,
        |        MAX(CASE WHEN rk = 1 THEN neighbor_id END) AS best,
        |        MAX(CASE WHEN rk = 1 THEN cos_fp END) AS best_cos_fp
        |      FROM k4 GROUP BY 1, 2),
        |s AS (SELECT vec_id AS src_id, best AS tgt_id, best_cos_fp, sum_top_fp AS sx
        |      FROM a WHERE side = 0),
        |t AS (SELECT vec_id AS tgt_id, best AS tgt_best, sum_top_fp AS sy
        |      FROM a WHERE side = 1)
        |SELECT s.src_id, s.tgt_id, s.best_cos_fp AS cos_fp,
        |  s.best_cos_fp * 8 AS margin_num_fp,
        |  CAST(s.sx + t.sy AS BIGINT) AS margin_den_fp,
        |  t.tgt_best = s.src_id AS mutual,
        |  t.tgt_best = s.src_id AND s.sx + t.sy > 0
        |    AND 800 * s.best_cos_fp >= 101 * (s.sx + t.sy) AS accepted
        |FROM s JOIN t ON s.tgt_id = t.tgt_id""".stripMargin) { (spark, dir) =>
      val vecs = Tables.load(spark, dir, "embeddings")
        .select(col("vec_id"), col("embedding"),
          pmod(col("vec_id"), lit(2L)).cast("long").as("side"))
      val topk = Similarity.bruteForceTopKBroadcast(
        vecs, "vec_id", "embedding", k = 4, excludeSameLabel = Some("side"))
      val fp = topk.select(col("vec_id"), col("neighbor_id"), col("rk"),
        (col("cos").cast("decimal(18,6)") * 1000000).cast("long").as("cos_fp"))
      val agg = fp.groupBy(col("vec_id")).agg(
        sum(col("cos_fp")).as("sum_top_fp"),
        max(when(col("rk") === 1, col("neighbor_id"))).as("best"),
        max(when(col("rk") === 1, col("cos_fp"))).as("best_cos_fp"))
      val sideOf = pmod(col("vec_id"), lit(2L))
      val src = agg.filter(sideOf === 0).select(
        col("vec_id").as("src_id"), col("best").as("tgt_id"),
        col("best_cos_fp"), col("sum_top_fp").as("sx"))
      val tgt = agg.filter(sideOf === 1).select(
        col("vec_id").as("tgt_id"), col("best").as("tgt_best"),
        col("sum_top_fp").as("sy"))
      src.join(tgt, Seq("tgt_id"))
        .select(col("src_id"), col("tgt_id"),
          col("best_cos_fp").as("cos_fp"),
          (col("best_cos_fp") * 8).as("margin_num_fp"),
          (col("sx") + col("sy")).as("margin_den_fp"),
          (col("tgt_best") === col("src_id")).as("mutual"),
          (col("tgt_best") === col("src_id") && col("sx") + col("sy") > 0 &&
            col("best_cos_fp") * 800 >= (col("sx") + col("sy")) * 101).as("accepted"))
    },

    // Embedding-cosine near-dup pairs (the dedup flavor): exact, symmetric
    // output (id_a < id_b), high threshold.
    QueryDef.sql(
      "d7_embedding_near_dup",
      """WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
        |n AS (SELECT vec_id, e, sqrt(list_dot_product(e, e)) AS nrm FROM v)
        |SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        |       round(list_dot_product(a.e, b.e) / (a.nrm * b.nrm), 6) AS cos
        |FROM n a JOIN n b ON a.vec_id < b.vec_id
        |WHERE round(list_dot_product(a.e, b.e) / (a.nrm * b.nrm), 6) >= 0.95""".stripMargin) { (spark, dir) =>
      Similarity.nearDupPairs(
        Tables.load(spark, dir, "embeddings"), "vec_id", "embedding", threshold = 0.95)
    },

    // Embedding duplicate clusters: cosine near-dup pairs → connected
    // components → keeper election — d13's cluster-assignment stage
    // composed over the embedding modality (threshold tuned so the
    // synthetic corpus actually forms multi-member components). Oracled
    // against DuckDB's recursive-CTE closure, like d13.
    QueryDef.sql(
      "d14_embedding_dup_clusters",
      """WITH RECURSIVE
        |v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
        |n AS (SELECT vec_id, e, sqrt(list_dot_product(e, e)) AS nrm FROM v),
        |pairs AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b
        |          FROM n a JOIN n b ON a.vec_id < b.vec_id
        |          WHERE round(list_dot_product(a.e, b.e) / (a.nrm * b.nrm), 6) >= 0.45),
        |e2 AS (SELECT id_a AS src, id_b AS dst FROM pairs UNION ALL SELECT id_b, id_a FROM pairs),
        |reach(id, label) AS (
        |  SELECT vec_id, vec_id FROM v
        |  UNION
        |  SELECT e2.dst, r.label FROM reach r JOIN e2 ON r.id = e2.src)
        |SELECT id AS vec_id, min(label) AS component, min(label) = id AS is_keeper
        |FROM reach GROUP BY id""".stripMargin) { (spark, dir) =>
      val vecs = Tables.load(spark, dir, "embeddings")
      val pairs = Similarity.nearDupPairs(vecs, "vec_id", "embedding", threshold = 0.45)
      val clusters = graft.operators.ConnectedComponents.minLabel(
        vecs.select(col("vec_id")), "vec_id", pairs, "id_a", "id_b")
      clusters.select(
        col("id").as("vec_id"), col("label").as("component"),
        (col("label") === col("id")).as("is_keeper"))
    },

    // Per-group embedding centroid accumulation: sum + count per (label,
    // dimension), the distributed half of a mean-vector/cluster-summary
    // computation (the consumer divides). Accumulates in FIXED-POINT
    // (floor(v·1e6) as int64) so the distributed sum is exact and
    // order-independent — a float sum would be partial-agg-order-dependent
    // and engine-divergent. posexplode is output-proportional (n·d rows);
    // ONE agg shuffle on (label, dim) with map-side partial combine.
    QueryDef.sql(
      "d15_embedding_centroids",
      """SELECT label, CAST(i - 1 AS INT) AS dim,
        |  CAST(SUM(CAST(floor(CAST(v AS DOUBLE) * 1000000) AS BIGINT)) AS BIGINT) AS centroid_sum_1e6,
        |  COUNT(*) AS n
        |FROM (SELECT label, unnest(embedding) AS v,
        |             unnest(range(1, len(embedding)+1)) AS i FROM embeddings) x
        |GROUP BY 1, 2""".stripMargin) { (spark, dir) =>
      Tables.load(spark, dir, "embeddings")
        .select(col("label"), posexplode(col("embedding")).as(Seq("dim", "v")))
        .groupBy(col("label"), col("dim"))
        .agg(
          sum(floor(col("v").cast("double") * 1000000).cast("long"))
            .as("centroid_sum_1e6"),
          count(lit(1)).as("n"))
    },

    // L2 normalization: unit-length embeddings (normalize-then-dot ==
    // cosine, the standard pre-step that lets downstream ANN use plain dot
    // products). Scan-only per-row work — the norm folds once per vector
    // (same sequential double fold as DuckDB's list_dot_product, so the
    // quotient is bit-identical) and the exploded output is rounded to 6dp
    // at the boundary. Output is (vec_id, dim, value) long-form: array
    // cells don't survive the harness's sort, and long form is also what a
    // (label, dim)-keyed consumer joins against.
    QueryDef.sql(
      "d16_embedding_normalize",
      """WITH n AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e,
        |                  sqrt(list_dot_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[]))) AS nrm
        |           FROM embeddings)
        |SELECT vec_id, CAST(i - 1 AS INT) AS dim, round(v / nrm, 6) AS nv
        |FROM (SELECT vec_id, nrm, unnest(e) AS v,
        |             unnest(range(1, len(e)+1)) AS i FROM n) x""".stripMargin) { (spark, dir) =>
      Tables.load(spark, dir, "embeddings")
        .select(col("vec_id"),
          graft.functions.Similarity.norm(col("embedding")).as("nrm"),
          posexplode(col("embedding")).as(Seq("dim", "v")))
        .select(col("vec_id"), col("dim"),
          round(col("v").cast("double") / col("nrm"), 6).as("nv"))
    },

    // SemDeDup: semantic dedup with pairwise cosine confined to a cluster —
    // the published recipe for trillion-token corpora (cluster first, then
    // O(|cluster|²) instead of O(n²)). Here the coarse partition is the
    // `label` column (any quantizer output slots in); keeper rule = lowest
    // id in the duplicate set, so output is retry-stable. ONE equi-join
    // shuffle on the cluster id; the final attribution join is a broadcast
    // at dim scale and a shuffle at corpus scale — both fine.
    QueryDef.sql(
      "d17_semdedup",
      """WITH n AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS e,
        |                  sqrt(list_dot_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[]))) AS nrm
        |           FROM embeddings),
        |d AS (SELECT a.vec_id, min(b.vec_id) AS dup_of
        |      FROM n a JOIN n b ON a.label = b.label AND b.vec_id < a.vec_id
        |      WHERE NOT isnan(a.nrm * b.nrm) AND a.nrm * b.nrm > 0
        |        AND round(list_dot_product(a.e, b.e) / (a.nrm * b.nrm), 6) >= 0.45
        |      GROUP BY 1)
        |SELECT n.vec_id, n.label AS cluster, d.dup_of IS NOT NULL AS is_dup, d.dup_of
        |FROM n LEFT JOIN d USING (vec_id)""".stripMargin) { (spark, dir) =>
      graft.functions.Similarity.semDedup(
        Tables.load(spark, dir, "embeddings"),
        "vec_id", "embedding", "label", threshold = 0.45)
    },

    // Embedding outlier detection: cosine of each vector against its
    // group's mean DIRECTION — the pre-training gate that drops
    // mis-clustered / drifted vectors. The centroid direction is the
    // fixed-point component sum (d15's exact int64 accumulation — cosine is
    // scale-invariant, so the un-divided sum IS the mean direction), built
    // once per label and broadcast; the per-vector cosine is a sequential
    // double fold identical to DuckDB's list_dot_product. Shuffles: one
    // (label, dim) agg, one label agg — both centroid-sized, never
    // corpus-wide pair work.
    QueryDef.sql(
      "d18_embedding_outliers",
      """WITH ex AS (SELECT label, CAST(i - 1 AS INT) AS dim,
        |                   CAST(floor(CAST(v AS DOUBLE) * 1000000) AS BIGINT) AS sv
        |            FROM (SELECT label, unnest(embedding) AS v,
        |                         unnest(range(1, len(embedding)+1)) AS i FROM embeddings) x),
        |s AS (SELECT label, dim, CAST(SUM(sv) AS BIGINT) AS s FROM ex GROUP BY 1, 2),
        |c AS (SELECT label, list(CAST(s AS DOUBLE) ORDER BY dim) AS cvec FROM s GROUP BY 1),
        |v AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
        |r AS (SELECT vec_id, v.label AS label,
        |             round(list_dot_product(e, cvec) / (sqrt(list_dot_product(e, e)) * sqrt(list_dot_product(cvec, cvec))), 6) AS cos0
        |      FROM v JOIN c ON v.label = c.label)
        |SELECT vec_id, label,
        |       CASE WHEN isnan(cos0) THEN NULL ELSE cos0 END AS cos_centroid,
        |       (cos0 IS NULL OR isnan(cos0) OR cos0 < 0.0) AS is_outlier
        |FROM r""".stripMargin) { (spark, dir) =>
      import graft.functions.Similarity
      val vecs = Tables.load(spark, dir, "embeddings")
      val sums = vecs
        .select(col("label"), posexplode(col("embedding")).as(Seq("dim", "v")))
        .groupBy(col("label"), col("dim"))
        .agg(sum(floor(col("v").cast("double") * 1000000).cast("long")).as("s"))
      val cents = sums
        .groupBy(col("label"))
        .agg(array_sort(collect_list(struct(col("dim"), col("s")))).as("ds"))
        .select(col("label"),
          expr("transform(ds, x -> CAST(x.s AS DOUBLE))").as("cvec"))
      val cos = round(
        Similarity.dot(col("e"), col("cvec")) /
          (sqrt(Similarity.dot(col("e"), col("e"))) *
            sqrt(Similarity.dot(col("cvec"), col("cvec")))), 6)
      vecs.select(col("vec_id"), col("label"), col("embedding").cast("array<double>").as("e"))
        .join(broadcast(cents), "label")
        .withColumn("cos0", cos)
        // Degenerate rows surface differently per engine — Spark's 0/0
        // divide is NULL while DuckDB's is NaN; NaN-component vectors are
        // NaN in both — so the cosine is normalized to NULL and is_outlier
        // treats every degenerate shape as an outlier: the gate exists to
        // drop garbage rows, and NaN < 0.0 / NULL < 0.0 would both let
        // them through.
        .select(col("vec_id"), col("label"),
          when(isnan(col("cos0")), lit(null)).otherwise(col("cos0")).as("cos_centroid"),
          (col("cos0").isNull || isnan(col("cos0")) || col("cos0") < 0.0).as("is_outlier"))
    },

    // D27: embedding-space split contamination — near-identical vectors
    // that landed on OPPOSITE sides of the deterministic hash split
    // (t18's md5 bands): the semantic twin of d12's n-gram leakage check,
    // catching paraphrases and re-encodes that no shingle overlap sees.
    // Pair stage = the same cosine pair machinery as d14; the rollup
    // reports, per unordered split pair, how many cross-split near-dup
    // edges exist and how tight the worst one is. A clean split protocol
    // drives cross_pairs to 0 by deduplicating BEFORE splitting.
    QueryDef.sql(
      "d27_split_contamination",
      """WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e,
        |    CASE WHEN substr(md5(CAST(vec_id AS VARCHAR)), 1, 2) < 'cc' THEN 'train'
        |         WHEN substr(md5(CAST(vec_id AS VARCHAR)), 1, 2) < 'e6' THEN 'val'
        |         ELSE 'test' END AS split
        |  FROM embeddings),
        |n AS (SELECT vec_id, split, e, sqrt(list_dot_product(e, e)) AS nrm FROM v),
        |p AS (SELECT a.split AS sa, b.split AS sb,
        |             round(list_dot_product(a.e, b.e) / (a.nrm * b.nrm), 6) AS cos
        |      FROM n a JOIN n b ON a.vec_id < b.vec_id
        |      WHERE round(list_dot_product(a.e, b.e) / (a.nrm * b.nrm), 6) >= 0.45
        |        AND a.split <> b.split)
        |SELECT least(sa, sb) AS split_a, greatest(sa, sb) AS split_b,
        |  COUNT(*) AS cross_pairs, MAX(cos) AS worst_cos
        |FROM p GROUP BY 1, 2""".stripMargin) { (spark, dir) =>
      val h = substring(md5(col("vec_id").cast("string")), 1, 2)
      val split = when(h < "cc", "train").when(h < "e6", "val").otherwise("test")
      val vecs = Tables.load(spark, dir, "embeddings")
        .withColumn("split", split)
      val pairs = Similarity.nearDupPairs(vecs, "vec_id", "embedding", threshold = 0.45)
      val splits = vecs.select(col("vec_id"), col("split"))
      pairs
        .join(splits.select(col("vec_id").as("id_a"), col("split").as("sa")), "id_a")
        .join(splits.select(col("vec_id").as("id_b"), col("split").as("sb")), "id_b")
        .filter(col("sa") =!= col("sb"))
        .groupBy(least(col("sa"), col("sb")).as("split_a"),
          greatest(col("sa"), col("sb")).as("split_b"))
        .agg(count(lit(1)).as("cross_pairs"), max(col("cos")).as("worst_cos"))
    },

    // D46: BM25 lexical more-like-this retrieval (functions/Bm25) — the
    // term-statistics complement to d5/d32's embedding neighbors. Query
    // docs = doc_id % 101 == 0; every other doc is scored over shared
    // terms via the inverted tf index and ranked top-3 per query. Scores
    // are exact BIGINT micro-units (per-term round(·,1e-6) then integer
    // sum — commutes under any partitioning), so the driver hash pins the
    // whole idf/length-normalization arithmetic, not just the ranking.
    QueryDef.sql(
      "d46_bm25_topk",
      """WITH t AS (SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS ts FROM documents),
        |e AS (SELECT doc_id, len(ts) AS dl, unnest(ts) AS term FROM t),
        |tf AS (SELECT doc_id, term, dl, COUNT(*) AS cnt FROM e WHERE term <> '' GROUP BY 1, 2, 3),
        |df AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
        |st AS (SELECT COUNT(*) AS n, SUM(len(ts)) AS sum_dl FROM t),
        |q AS (SELECT DISTINCT doc_id AS q_id, term FROM tf WHERE doc_id % 101 = 0),
        |w AS (SELECT q.q_id, tf.doc_id AS d_id,
        |    CAST(round(ln(1.0 + (st.n - df.df + 0.5) / (df.df + 0.5)) *
        |      (tf.cnt * 2.2) /
        |      (tf.cnt + 1.2 * (1.0 - 0.75 + 0.75 * tf.dl / (CAST(st.sum_dl AS DOUBLE) / CAST(st.n AS DOUBLE)))) *
        |      1000000.0) AS BIGINT) AS w
        |  FROM q JOIN tf USING (term) JOIN df USING (term) CROSS JOIN st
        |  WHERE tf.doc_id <> q.q_id),
        |s AS (SELECT q_id, d_id, SUM(w) AS score_fp6 FROM w GROUP BY 1, 2),
        |r AS (SELECT q_id, d_id AS doc_id, CAST(score_fp6 AS BIGINT) AS score_fp6,
        |        row_number() OVER (PARTITION BY q_id ORDER BY score_fp6 DESC, d_id) AS rk
        |      FROM s)
        |SELECT q_id, doc_id, score_fp6, CAST(rk AS INT) AS rk FROM r WHERE rk <= 3""".stripMargin) { (spark, dir) =>
      val docs = Tables.load(spark, dir, "documents")
      graft.functions.Bm25.topK(
        docs, "doc_id", "text",
        docs.filter(col("doc_id") % 101 === 0), "doc_id", "text",
        k = 3, excludeSelf = true)
    },

    // D47: HYBRID retrieval via reciprocal-rank fusion — the standard
    // two-tower production shape (lexical BM25 ∪ dense cosine, fused as
    // Σ 1/(60+rank) per system): embeddings catch paraphrase, BM25
    // catches exact vocabulary, and RRF needs no score calibration
    // between the two. Both systems rank top-5 for the same query set
    // (doc_id/vec_id share the id space by fixture construction); RRF
    // contributions land as BIGINT 1e-9 fixed point, so the fused score
    // is an exact integer sum and the hash pins both systems' rank
    // boundaries AND the fusion arithmetic. The dense side here is the
    // d5 exact baseline (a query-subset broadcast); a web-scale corpus
    // swaps in ivfTopK/lshTopK ranks — fusion consumes (q, doc, rank)
    // triples and does not care which engine produced them.
    QueryDef.sql(
      "d47_hybrid_rrf_fusion",
      """WITH t AS (SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS ts FROM documents),
        |e AS (SELECT doc_id, len(ts) AS dl, unnest(ts) AS term FROM t),
        |tf AS (SELECT doc_id, term, dl, COUNT(*) AS cnt FROM e WHERE term <> '' GROUP BY 1, 2, 3),
        |df AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
        |st AS (SELECT COUNT(*) AS n, SUM(len(ts)) AS sum_dl FROM t),
        |q AS (SELECT DISTINCT doc_id AS q_id, term FROM tf WHERE doc_id % 101 = 0),
        |w AS (SELECT q.q_id, tf.doc_id AS d_id,
        |    CAST(round(ln(1.0 + (st.n - df.df + 0.5) / (df.df + 0.5)) *
        |      (tf.cnt * 2.2) /
        |      (tf.cnt + 1.2 * (1.0 - 0.75 + 0.75 * tf.dl / (CAST(st.sum_dl AS DOUBLE) / CAST(st.n AS DOUBLE)))) *
        |      1000000.0) AS BIGINT) AS w
        |  FROM q JOIN tf USING (term) JOIN df USING (term) CROSS JOIN st
        |  WHERE tf.doc_id <> q.q_id),
        |s AS (SELECT q_id, d_id, SUM(w) AS score FROM w GROUP BY 1, 2),
        |lex AS (SELECT q_id, d_id, rk FROM (
        |    SELECT q_id, d_id, row_number() OVER (PARTITION BY q_id ORDER BY score DESC, d_id) AS rk FROM s) z
        |  WHERE rk <= 5),
        |v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS ve FROM embeddings),
        |nv AS (SELECT vec_id, ve, sqrt(list_dot_product(ve, ve)) AS nrm FROM v),
        |den AS (SELECT a.vec_id AS q_id, b.vec_id AS d_id,
        |        round(list_dot_product(a.ve, b.ve) / (a.nrm * b.nrm), 6) AS cos
        |      FROM nv a JOIN nv b ON a.vec_id % 101 = 0 AND b.vec_id <> a.vec_id),
        |dnk AS (SELECT q_id, d_id, rk FROM (
        |    SELECT q_id, d_id, row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, d_id) AS rk FROM den) z
        |  WHERE rk <= 5),
        |u AS (SELECT q_id, d_id, rk FROM lex UNION ALL SELECT q_id, d_id, rk FROM dnk),
        |f AS (SELECT q_id, d_id,
        |        CAST(SUM(CAST(round(1000000000.0 / (60 + rk)) AS BIGINT)) AS BIGINT) AS rrf_fp9,
        |        COUNT(*) AS n_systems
        |      FROM u GROUP BY 1, 2)
        |SELECT q_id, d_id AS doc_id, rrf_fp9, CAST(n_systems AS INT) AS n_systems, CAST(rk AS INT) AS rk FROM (
        |  SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY rrf_fp9 DESC, d_id) AS rk FROM f) z
        |WHERE rk <= 3""".stripMargin) { (spark, dir) =>
      val docs = Tables.load(spark, dir, "documents")
      val lex = graft.functions.Bm25.topK(
          docs, "doc_id", "text",
          docs.filter(col("doc_id") % 101 === 0), "doc_id", "text",
          k = 5, excludeSelf = true)
        .select(col("q_id"), col("doc_id").as("d_id"), col("rk"))
      val nv = Tables.load(spark, dir, "embeddings").select(
        col("vec_id"), col("embedding").cast("array<double>").as("ve"))
        .withColumn("nrm", Similarity.norm(col("ve")))
      val qv = nv.filter(col("vec_id") % 101 === 0)
        .select(col("vec_id").as("q_id"), col("ve").as("qe"), col("nrm").as("qn"))
      val denW = org.apache.spark.sql.expressions.Window
        .partitionBy(col("q_id")).orderBy(col("cos").desc, col("d_id"))
      val den = nv.join(broadcast(qv), col("vec_id") =!= col("q_id"))
        .select(col("q_id"), col("vec_id").as("d_id"),
          round(Similarity.dot(col("qe"), col("ve")) / (col("qn") * col("nrm")), 6).as("cos"))
        .withColumn("rk", row_number().over(denW))
        .filter(col("rk") <= 5)
        .select(col("q_id"), col("d_id"), col("rk"))
      val fused = lex.unionByName(den)
        .select(col("q_id"), col("d_id"),
          round(lit(1000000000.0) / (lit(60) + col("rk"))).cast("long").as("c"))
        .groupBy(col("q_id"), col("d_id"))
        .agg(sum(col("c")).as("rrf_fp9"), count(lit(1)).cast("int").as("n_systems"))
      val fw = org.apache.spark.sql.expressions.Window
        .partitionBy(col("q_id")).orderBy(col("rrf_fp9").desc, col("d_id"))
      fused.withColumn("rk", row_number().over(fw).cast("int"))
        .filter(col("rk") <= 3)
        .select(col("q_id"), col("d_id").as("doc_id"),
          col("rrf_fp9"), col("n_systems"), col("rk"))
    },

    // D48: product-quantization ANN (ADC scan) — the memory-compression
    // fourth member of the ANN family (brute d5, LSH d6, IVF d8): the
    // index is n·m code bytes, queries rank by per-subspace table
    // lookups. Bounded query subset (vec_id % 11 == 0) — the production
    // posture; the all-queries configuration is the d5 brute regime over
    // codes. Rows-only (the trained codebook has no SQL equivalent);
    // the exact-dup THEOREM is driver-hashed by d49 and recall is pinned
    // in SimilaritySpec.
    QueryDef.rowsOnly("d48_pq_ann_topk") { (spark, dir) =>
      val vecs = Tables.load(spark, dir, "embeddings")
      Similarity.pqTopK(vecs, "vec_id", "embedding",
        vecs.filter(col("vec_id") % 11 === 0), "vec_id", "embedding", k = 3)
    },

    // D49: the PQ exact-dup audit (d41/d42/d43's theorem pattern) —
    // planted twins (vec_id + 1e6, identical vectors) must (a) quantize
    // to the query's own codes, so the twin's ADC distance EQUALS the
    // query's self-distance, and (b) sit AT the provable ADC minimum
    // (per-subspace table entries are minimized by the encoder's own
    // argmin — same fold, same doubles — and fixed-point rounding is
    // monotone, so no corpus vector can score below the twin). Both
    // booleans are exact BIGINT micro-unit comparisons inside ONE
    // pqDistances call (one codebook; distances from separate calls are
    // not comparable), so the driver hash pins the encoder, the table
    // build, and the rounding discipline at once.
    QueryDef.sql(
      "d49_pq_exactdup_audit",
      """SELECT vec_id, vec_id + 1000000 AS twin_id,
        |  TRUE AS twin_dist_is_self_dist, TRUE AS twin_dist_is_min
        |FROM embeddings WHERE vec_id < 100""".stripMargin) { (spark, dir) =>
      val vecs = Tables.load(spark, dir, "embeddings")
        .select(col("vec_id"), col("embedding"))
      val twins = vecs.filter(col("vec_id") < 100)
        .select((col("vec_id") + 1000000).as("vec_id"), col("embedding"))
      val aug = vecs.unionAll(twins)
      val queries = vecs.filter(col("vec_id") < 100)
      val dists = Similarity.pqDistances(aug, "vec_id", "embedding",
        queries, "vec_id", "embedding")
      val dSelf = dists.filter(col("neighbor_id") === col("vec_id"))
        .select(col("vec_id"), col("adc_fp9").as("d_self"))
      val dTwin = dists.filter(col("neighbor_id") === col("vec_id") + 1000000)
        .select(col("vec_id"), col("adc_fp9").as("d_twin"))
      val dMin = dists.filter(col("neighbor_id") =!= col("vec_id"))
        .groupBy(col("vec_id")).agg(min(col("adc_fp9")).as("d_min"))
      dSelf.join(dTwin, Seq("vec_id")).join(dMin, Seq("vec_id"))
        .select(col("vec_id"), (col("vec_id") + 1000000).as("twin_id"),
          (col("d_twin") === col("d_self")).as("twin_dist_is_self_dist"),
          (col("d_twin") === col("d_min")).as("twin_dist_is_min"))
    },

    // D52: Johnson–Lindenstrauss Rademacher projection 64→8 dims — the
    // dense dimensionality sketch that makes downstream pair work 8×
    // cheaper while preserving pairwise geometry within (1±ε). The ±1
    // matrix is a PLAN-TIME constant (Similarity.jlSigns) rendered into
    // both engines as literals, so the gate hashes the full projected
    // values: each output is one codegen'd left-fold dot over the row —
    // a narrow map with no shuffle, embarrassingly parallel at 100 TB.
    // Exact-dup preservation (identical vector ⇒ identical projection)
    // is pinned in SimilaritySpec.
    QueryDef.sql(
      "d52_jl_projection", {
        val lists = Similarity.jlSigns(DIM, 8)
          .map(_.map(s => if (s > 0) "1" else "-1").mkString("[", ", ", "]"))
        val cols = lists.zipWithIndex
          .map { case (l, j) => s"round(list_dot_product(e, CAST($l AS DOUBLE[])), 6) AS p$j" }
          .mkString(",\n  ")
        s"""WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings)
           |SELECT vec_id, $cols FROM v""".stripMargin
      }) { (spark, dir) =>
      Similarity.jlProject(
        Tables.load(spark, dir, "embeddings"), "vec_id", "embedding",
        dim = DIM, outDim = 8)
    },

    // D58: distributed Gram matrix + per-dim sums (functions/expr/
    // GramMatrix) — the one-pass sufficient statistics for covariance /
    // PCA / whitening over the embedding column: cov(i,j) =
    // (n·dot − sᵢ·sⱼ)/n² in exact integers, eigen work driver-side on
    // the d×d result. The TypedImperativeAggregate keeps ONE
    // d(d+1)/2+d+1 long buffer per task with map-side combine — the
    // shuffle ships ~2 k longs per partition, while the ORACLE does the
    // definitional |rows|×d² pair explode (exactly what 100 TB cannot).
    // Vectors are pre-rounded to 1e6 fixed point declaratively (same
    // round() both engines); every accumulation is add/multiplyExact —
    // overflow refuses loudly (GramSpec).
    QueryDef.sql(
      "d58_embedding_gram",
      """WITH e AS (SELECT list_transform(CAST(embedding AS DOUBLE[]),
        |             x -> CAST(round(x * 1000000) AS BIGINT)) AS q FROM embeddings),
        |ks AS (SELECT CAST(unnest(range(1, 65)) AS INT) AS k),
        |idx AS (SELECT i.k AS i, j.k AS j FROM ks i JOIN ks j ON j.k >= i.k),
        |n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM e),
        |sums AS (SELECT ks.k, CAST(SUM(q[ks.k]) AS BIGINT) AS s
        |         FROM e CROSS JOIN ks GROUP BY 1),
        |dots AS (SELECT idx.i, idx.j, CAST(SUM(q[idx.i] * q[idx.j]) AS BIGINT) AS dot_fp
        |         FROM e CROSS JOIN idx GROUP BY 1, 2)
        |SELECT d.i, d.j, n.n, si.s AS sum_i, sj.s AS sum_j, d.dot_fp
        |FROM dots d JOIN sums si ON si.k = d.i JOIN sums sj ON sj.k = d.j
        |CROSS JOIN n""".stripMargin) { (spark, dir) =>
      val q = transform(col("embedding").cast("array<double>"),
        x => round(x * lit(1000000.0)).cast("long"))
      Tables.load(spark, dir, "embeddings")
        .agg(graft.functions.expr.GramMatrix.gram(q, DIM).as("g"))
        .select(col("g.n").as("n"), col("g.sums").as("sums"),
          explode(col("g.entries")).as("e"))
        .select(col("e.i").as("i"), col("e.j").as("j"), col("n"),
          element_at(col("sums"), col("e.i")).as("sum_i"),
          element_at(col("sums"), col("e.j")).as("sum_j"),
          col("e.dot").as("dot_fp"))
    },

    // D59: dominant principal direction by FIXED-POINT power iteration
    // (functions/Pca.topDirectionFixedPoint) — d58's promised second
    // half, with the d21 determinism discipline applied to linear
    // algebra: C = n·dot − s·sᵀ in exact integers, truncating-divided by
    // 1e11 (Scala `/`, Spark `div` and DuckDB `//` all truncate toward
    // zero — probed), then 4 rounds of y = C'·x with max-|y|
    // renormalization to 1e5 fixed point. Every step is exact integer
    // arithmetic, so the direction is BIT-IDENTICAL across engines and
    // the oracle replays the whole iteration unrolled. The only collect
    // is the d(d+1)/2 Gram row — bounded by dimension, never data.
    QueryDef.sql(
      "d59_pca_power_direction", {
        val base =
          """WITH e AS (SELECT list_transform(CAST(embedding AS DOUBLE[]),
            |             x -> CAST(round(x * 1000000) AS BIGINT)) AS q FROM embeddings),
            |ks AS (SELECT CAST(unnest(range(1, 65)) AS INT) AS k),
            |n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM e),
            |sums AS (SELECT ks.k, CAST(SUM(q[ks.k]) AS BIGINT) AS s
            |         FROM e CROSS JOIN ks GROUP BY 1),
            |dots AS (SELECT i.k AS i, j.k AS j, CAST(SUM(q[i.k] * q[j.k]) AS BIGINT) AS dot
            |         FROM e CROSS JOIN ks i CROSS JOIN ks j GROUP BY 1, 2),
            |cf AS (SELECT d.i, d.j,
            |         (n.n * d.dot - si.s * sj.s) // 100000000000 AS c
            |       FROM dots d JOIN sums si ON si.k = d.i JOIN sums sj ON sj.k = d.j
            |       CROSS JOIN n),
            |x0 AS (SELECT ks.k AS i, CAST(100000 AS BIGINT) AS x FROM ks)""".stripMargin
        val rounds = (1 to 4).map { r =>
          s"""y$r AS (SELECT cf.i, CAST(SUM(cf.c * p.x) AS BIGINT) AS y
             |        FROM cf JOIN x${r - 1} p ON p.i = cf.j GROUP BY 1),
             |m$r AS (SELECT MAX(abs(y)) AS m FROM y$r),
             |x$r AS (SELECT y$r.i, (y$r.y * 100000) // m$r.m AS x
             |        FROM y$r CROSS JOIN m$r)""".stripMargin
        }.mkString(",\n")
        s"$base,\n$rounds\nSELECT i, x AS x_fp FROM x4"
      }) { (spark, dir) =>
      val q = transform(col("embedding").cast("array<double>"),
        x => round(x * lit(1000000.0)).cast("long"))
      val gram = Tables.load(spark, dir, "embeddings")
        .agg(graft.functions.expr.GramMatrix.gram(q, DIM).as("g"))
        .select(col("g.n").as("n"), col("g.sums").as("sums"),
          col("g.entries").as("entries"))
      graft.functions.Pca.topDirectionFixedPoint(gram, DIM, rounds = 4,
        cDiv = 100000000000L, xScale = 100000L)
    })
}
