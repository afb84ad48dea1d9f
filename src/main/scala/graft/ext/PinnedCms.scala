package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Count-Min sketch over a PINNED, engine-replayable hash family — the
  * a35 KMV device applied to CMS counters (Cormode–Muthukrishnan
  * LATIN'04). Cell index for row key k at depth d is the 60-bit
  * md5 hash of "d:k" (the a31 '0x'-cast device) mod the width, so the
  * width×depth counter table is a deterministic integer aggregate BOTH
  * engines can compute: Spark builds it with one exploded partial-agg
  * pass (codegen md5, map-side combine to ≤ depth·width cells per
  * partition) and DuckDB replays the identical cells in SQL —
  * `CAST(('0x' || substring(md5(d || ':' || key), 1, 15)) AS BIGINT)
  * % width`. That is what moves a14/st10 from rows-only sketch
  * registers to hash-green oracle rows: unlike Spark's built-in
  * `stat.countMinSketch` (Murmur3 with private seeding — honest engine
  * state), every counter here is portable arithmetic.
  *
  * Guarantee (independent of the hash swap): estimate = min over d of
  * counter(d, cell_d(k)) ≥ exact always, and ≤ exact + (e/width)·N
  * with probability ≥ 1 − e^−depth per probe — pinned quantitatively
  * in AnalyticsSpec / StreamAndMultimodalSpec at two scales.
  *
  * Scale shape: the build is ONE corpus pass (the ×depth explode
  * partial-aggs map-side, so each partition ships ≤ depth·width cell
  * partials — bounded by the sketch geometry, never the data); the
  * counter table itself is ≤ depth·width rows (~14 k at the a14
  * geometry) — small enough to collect/broadcast, exactly like the
  * serialized sketch object it replaces.
  */
object PinnedCms {

  /** a14's geometry: eps = e/2000 ≈ 0.00136 (worst-case slack ~820 at
    * sf0.1's 600 k rows, 8× under the injected hot-key counts), depth 7
    * → per-probe failure e^−7 ≈ 0.0009. ≤ 14 k counter cells ≈ 112 KB.
    */
  val Width = 2000
  val Depth = 7
  val Eps: Double = math.E / Width
  val Confidence: Double = 1.0 - math.exp(-Depth.toDouble)

  /** Spark-side cell index of `key` at depth `d` — MUST stay
    * byte-identical to [[cellJvm]] and to the oracle SQL fragment
    * (md5 of "d:key" over the decimal renderings, first 15 hex chars,
    * mod width).
    */
  def cellCol(key: Column, d: Int, width: Int = Width): Column =
    pmod(conv(substring(md5(concat_ws(":", lit(d), key)), 1, 15), 16, 10)
      .cast("long"), lit(width.toLong))

  /** JVM replay of [[cellCol]] for the per-partition candidate heap and
    * the streaming state update. Pass a reusable MessageDigest (reset
    * per call) — allocation per row would dominate the hash itself.
    */
  def cellJvm(md: java.security.MessageDigest, key: Long, d: Int,
      width: Int = Width): Int = {
    md.reset()
    val dig = md.digest(s"$d:$key".getBytes(java.nio.charset.StandardCharsets.UTF_8))
    // first 15 hex chars = first 7 bytes + high nibble of byte 8 = 60 bits
    var h = 0L
    var i = 0
    while (i < 7) { h = (h << 8) | (dig(i) & 0xffL); i += 1 }
    h = (h << 4) | ((dig(7) & 0xf0L) >> 4)
    (h % width).toInt
  }

  /** The width×depth counter table from a single-column (key: long)
    * frame: one corpus pass, posexplode of the depth cells, partial agg
    * to the bounded (d, cell) grain.
    */
  def counters(keys: DataFrame, width: Int = Width,
      depth: Int = Depth): DataFrame =
    keys.select(posexplode(array(
        (0 until depth).map(d => cellCol(col("key"), d, width)): _*))
        .as(Seq("d", "cell")))
      .groupBy("d", "cell")
      .agg(count(lit(1)).as("cnt"))

  /** CMS estimates for a (key: long) frame of CANDIDATE keys against a
    * counter table — in-plan, fully oracle-replayable: explode the
    * depth cells, broadcast-join the bounded counter table, min per
    * key. A cell no row ever hit reads 0 (left join + coalesce).
    */
  def estimateAll(cand: DataFrame, ctr: DataFrame, width: Int = Width,
      depth: Int = Depth): DataFrame =
    cand.select(col("key"), posexplode(array(
        (0 until depth).map(d => cellCol(col("key"), d, width)): _*))
        .as(Seq("d", "cell")))
      .join(broadcast(ctr), Seq("d", "cell"), "left")
      .groupBy("key")
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est_n"))

  /** Flat counter array (row-major by depth) from a collected counter
    * table — the broadcast artifact the candidate heap probes.
    */
  def flatten(rows: Array[org.apache.spark.sql.Row], width: Int = Width,
      depth: Int = Depth): Array[Long] = {
    val flat = new Array[Long](width * depth)
    rows.foreach { r =>
      flat(r.getInt(0) * width + r.getLong(1).toInt) = r.getLong(2)
    }
    flat
  }

  /** JVM estimate against a [[flatten]]ed counter array. */
  def estJvm(md: java.security.MessageDigest, flat: Array[Long], key: Long,
      width: Int = Width, depth: Int = Depth): Long = {
    var e = Long.MaxValue
    var d = 0
    while (d < depth) {
      val c = flat(d * width + cellJvm(md, key, d, width))
      if (c < e) e = c
      d += 1
    }
    e
  }

  /** The DuckDB WITH-fragment computing the counter table over `src`
    * (a named CTE with a single `key` column): cells named `d`, `cell`,
    * `cnt` — the exact mirror of [[counters]].
    */
  def oracleCells(alias: String, src: String, width: Int = Width,
      depth: Int = Depth): String =
    s"""$alias AS (SELECT CAST(dd.d AS INT) AS d,
       |       CAST(('0x' || substring(md5(CAST(dd.d AS VARCHAR) || ':' ||
       |                                   CAST(key AS VARCHAR)), 1, 15))
       |            AS BIGINT) % $width AS cell,
       |       CAST(count(*) AS BIGINT) AS cnt
       |FROM $src, range($depth) dd(d) GROUP BY 1, 2)""".stripMargin
}
