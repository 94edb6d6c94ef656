package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Count-Min sketch (Cormode & Muthukrishnan 2005 — the public
  * mergeable frequency sketch), completing the sketch family beside HLL
  * (a11 distinct counts), GK (a13 quantiles), and Bloom (d29/d36
  * membership): sublinear-memory point-frequency estimates with the
  * one-sided guarantee est ≥ true (hash collisions only ADD), the
  * standard first pass of heavy-hitter detection when the exact
  * vocabulary (t16's route) no longer fits an aggregate.
  *
  * Spark-first shape: the sketch IS a relational aggregate — the d×w
  * counter matrix is the (row, bucket) → count frame, so building it is
  * one explode of d bucket coordinates per item and ONE map-side-combined
  * groupBy; per-partition partial aggregates literally are partial
  * sketches and the shuffle's merge is the sketch merge (counter
  * addition — associative, order-free, bit-exact). No UDFs, no driver
  * state, ≤ d·w output rows regardless of corpus size.
  *
  * Determinism: buckets come from the engine-portable md5-hex prefix
  * hash (the s13/t13 convention — `conv(substring(md5(...),1,15),16,10)`
  * on Spark ≡ `CAST('0x' || substring(md5(...),1,15) AS BIGINT)` in
  * DuckDB), so a gate can replay the ENTIRE sketch in SQL and the
  * estimate min is exact integer arithmetic.
  */
object CountMin {

  /** Bucket of `item` under hash row `row` (0-based): 60-bit md5-prefix
    * hash mod `width` — non-negative, engine-portable. */
  def bucket(row: Int, item: Column, width: Int): Column =
    pmod(conv(substring(md5(concat(lit(s"cms$row:"), item)), 1, 15), 16, 10)
      .cast("long"), lit(width.toLong))

  private def check(depth: Int, width: Int): Unit = {
    require(depth >= 1 && depth <= 16, s"depth must be in [1,16], got $depth")
    require(width >= 2 && width <= (1 << 20), s"width must be in [2,2^20], got $width")
  }

  /** Build the sketch over `items(itemCol)` (one count per ROW — pre-
    * aggregate upstream to weight): (r, b, cnt) for every non-empty
    * cell. One scan, one shuffle, ≤ depth·width rows out. */
  def build(items: DataFrame, itemCol: String, depth: Int, width: Int): DataFrame = {
    check(depth, width)
    items
      .select(posexplode(array((0 until depth)
        .map(r => bucket(r, col(itemCol), width)): _*)).as(Seq("r", "b")))
      .groupBy(col("r"), col("b"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** [[build]] over pre-aggregated (item, weight) rows — the one-scan
    * route when an exact item-count frame already exists: cell counts
    * are weight SUMS, identical to building from the raw stream. */
  def buildWeighted(items: DataFrame, itemCol: String, weightCol: String,
      depth: Int, width: Int): DataFrame = {
    check(depth, width)
    items
      .select(col(weightCol).cast("long").as("__w"),
        posexplode(array((0 until depth)
          .map(r => bucket(r, col(itemCol), width)): _*)).as(Seq("r", "b")))
      .groupBy(col("r"), col("b"))
      .agg(sum(col("__w")).as("cnt"))
  }

  /** Point estimates for `queries(itemCol)` against a built sketch:
    * est = min over hash rows of the cell count (absent cell = 0). The
    * sketch is ≤ depth·width rows → broadcast to the probe side; output
    * one row per query item with the one-sided `cnt_est ≥ true` bound
    * by construction. */
  def estimate(sketch: DataFrame, queries: DataFrame, itemCol: String,
      depth: Int, width: Int): DataFrame = {
    check(depth, width)
    val probes = queries
      .select(col(itemCol), posexplode(array((0 until depth)
        .map(r => bucket(r, col(itemCol), width)): _*)).as(Seq("r", "b")))
    probes
      .join(broadcast(sketch), Seq("r", "b"), "left")
      .groupBy(col(itemCol))
      .agg(min(coalesce(col("cnt"), lit(0L))).as("cnt_est"))
  }
}
