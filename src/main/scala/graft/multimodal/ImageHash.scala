package graft.multimodal

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Perceptual image DEDUP (X191): the dHash difference fingerprint over
  * REAL decoded PNGs plus the banded Hamming join that finds near-dup
  * images without an all-pairs pass — what an image-dataset curation
  * pipeline runs before training (near-identical images inflate memor-
  * ization exactly like near-identical text; the operator is the image
  * twin of the MinHash/SimHash family).
  *
  * The hash is [[graft.plans.PngDhash]] — exact integer arithmetic end
  * to end (ITU-601 gray, floor box-reduce, per-cell integer means), so
  * the DuckDB oracle recomputes every bit from the planted pixel
  * formulas: the gate pins the full decode → gray → grid → gradient
  * chain across all three planted layouts (8-bit RGB, 4-bit palette,
  * 16-bit gray). The gate grid is 4×4 (16 bits) because the planted
  * rasters are 4–16 px wide; the expression supports up to 8×8, the
  * production grid.
  *
  * Near-dup join: candidates must share the DIMENSION CLASS (w, h) —
  * the pre-bucket every image-dedup pipeline applies; a 16-bit
  * gradient hash alone would drown in cross-size coincidences — and at
  * least one of maxHam+1 disjoint hash bands (a pair within Hamming ≤
  * maxHam differs in ≤ maxHam bands, so by pigeonhole it matches one:
  * recall 1, the LSH-for-Hamming construction the SimHash48 join
  * uses). Verify is one exact `bit_count(a XOR b)` per candidate.
  * Images never shuffle — only (id, w, h, hash) rows.
  */
object ImageHash {

  /** Gate grid: 4×4 → 16-bit hash, 4 bands of 4 bits, maxHam 3. */
  val GW = 4
  val GH = 4
  val MaxHam = 3

  def dhashOf(content: Column, gw: Int = GW, gh: Int = GH): Column =
    org.apache.spark.sql.GraftColumnShim.column(graft.plans.PngDhash(
      org.apache.spark.sql.GraftColumnShim.expression(content), gw, gh))

  /** (media_id, width, height, dhash) over PngPlant(seed) images;
    * sub-grid images (w < gw+1) are ABSENT — no gradient signature,
    * no verdict.
    */
  def plantedDhash(spark: SparkSession, dir: String, seed: Column): DataFrame =
    graft.ops.ScaleOps.widen(Tables.documents(spark, dir))
      .select(col("doc_id").as("media_id"),
        org.apache.spark.sql.GraftColumnShim.column(graft.plans.PngPlant(
          org.apache.spark.sql.GraftColumnShim.expression(seed))).as("content"))
      .select(col("media_id"), dhashOf(col("content")).as("s"))
      .filter(col("s").isNotNull)
      .select(col("media_id"), col("s").getField("width").as("width"),
        col("s").getField("height").as("height"),
        col("s").getField("dhash").as("dhash"))

  /** Banded Hamming-≤ maxHam join over a (media_id, width, height,
    * dhash) table: nBands = maxHam + 1 bands of ceil(bits / nBands)
    * bits each, bucketed by (width, height, band, band_value).
    */
  def hammingPairs(dh: DataFrame, bits: Int = GW * GH, maxHam: Int = MaxHam): DataFrame = {
    val nBands = maxHam + 1
    val bw = (bits + nBands - 1) / nBands
    val mask = (1L << bw) - 1
    val bandArr = array((0 until nBands).map(j =>
      shiftright(col("dhash"), bw * j).bitwiseAND(lit(mask))): _*)
    val banded = dh.select(col("media_id"), col("width"), col("height"),
      col("dhash"), posexplode(bandArr).as(Seq("band", "bv")))
    val cand = banded.as("x").join(banded.as("y"),
        col("x.width") === col("y.width") && col("x.height") === col("y.height") &&
          col("x.band") === col("y.band") && col("x.bv") === col("y.bv") &&
          col("x.media_id") < col("y.media_id"))
      .select(col("x.media_id").as("a"), col("x.dhash").as("ha"),
        col("y.media_id").as("b"), col("y.dhash").as("hb"))
      .distinct()
    cand
      .withColumn("hamming", expr("bit_count(ha ^ hb)").cast("long"))
      .filter(col("hamming") <= maxHam)
      .select(col("a"), col("b"), col("hamming"))
  }

  // ---- oracle: recompute every hash bit from the planted formulas ----

  /** The planted-pixel CTE chain ending in hash(media_id, w, h, dhash)
    * — `seedSql` is the image seed as SQL over documents (e.g.
    * `doc_id` or `doc_id // 2`). Mirrors PngPlant's three layouts
    * verbatim.
    */
  /** The PngPlant pixel formulas as SQL r/g/b select items over seed
    * `s` and pixel index `i` — the one copy both this module's oracles
    * and the tar-composition gate restate (drift between them would be
    * a silent oracle fork).
    */
  private[graft] def rgbCaseSql(s: String = "s", i: String = "i"): String =
    s"""CASE $s % 4
       |      WHEN 1 THEN ($s + 17 * (($s + $i) % 16)) % 256
       |      WHEN 3 THEN (($s * 31 + 257 * $i) % 65536) // 256
       |      ELSE ($s + 3 * $i) % 256 END AS r,
       |    CASE $s % 4
       |      WHEN 1 THEN ($s * 7 + 23 * (($s + $i) % 16)) % 256
       |      WHEN 3 THEN (($s * 31 + 257 * $i) % 65536) // 256
       |      ELSE ($s * 7 + 5 * $i) % 256 END AS g,
       |    CASE $s % 4
       |      WHEN 1 THEN ($s * 13 + 29 * (($s + $i) % 16)) % 256
       |      WHEN 3 THEN (($s * 31 + 257 * $i) % 65536) // 256
       |      ELSE ($s * 13 + 11 * $i) % 256 END AS b""".stripMargin

  private def hashSql(seedSql: String): String =
    s"""dims AS (
       |  SELECT doc_id, $seedSql AS s, 4 + ($seedSql) % 13 AS w,
       |    4 + ($seedSql) % 11 AS h
       |  FROM documents),
       |px AS (
       |  SELECT doc_id, w, h, i % w AS x, i // w AS y,
       |    ${rgbCaseSql()}
       |  FROM dims, unnest(range(0, w * h)) AS u(i)
       |  WHERE w >= $GW + 1),
       |cells AS (
       |  SELECT doc_id, w, h, rr, c, sum(gray) // count(*) AS av FROM (
       |    SELECT doc_id, w, h, (y * $GH) // h AS rr, (x * ($GW + 1)) // w AS c,
       |      (299 * r + 587 * g + 114 * b) // 1000 AS gray
       |    FROM px) GROUP BY doc_id, w, h, rr, c),
       |hash AS (
       |  SELECT l.doc_id AS media_id, l.w, l.h,
       |    CAST(coalesce(sum(CASE WHEN l.av > r2.av
       |        THEN 1::BIGINT << (l.rr * $GW + l.c) ELSE 0 END), 0) AS BIGINT)
       |      AS dhash
       |  FROM cells l JOIN cells r2
       |    ON l.doc_id = r2.doc_id AND l.rr = r2.rr AND r2.c = l.c + 1
       |  GROUP BY l.doc_id, l.w, l.h)""".stripMargin

  def dhashOracle: String =
    s"""WITH ${hashSql("doc_id")}
       |SELECT media_id, CAST(w AS INTEGER) AS width,
       |  CAST(h AS INTEGER) AS height, dhash
       |FROM hash""".stripMargin

  def neardupOracle: String =
    s"""WITH ${hashSql("doc_id // 2")}
       |SELECT x.media_id AS a, y.media_id AS b,
       |  CAST(bit_count(xor(x.dhash, y.dhash)) AS BIGINT) AS hamming
       |FROM hash x JOIN hash y
       |  ON x.w = y.w AND x.h = y.h AND x.media_id < y.media_id
       |WHERE bit_count(xor(x.dhash, y.dhash)) <= $MaxHam""".stripMargin

  /** Image near-dup CLUSTERS (X205): connected components over the
    * banded Hamming pairs — the same closure the text dedup apply
    * rides (a chain A~B~C must collapse together even when A and C
    * never share a band); label propagation runs over the PAIR table
    * only, never the image table.
    */
  def clusters(spark: SparkSession, dir: String): DataFrame =
    graft.dedup.Dedup.Components.of(
      hammingPairs(plantedDhash(spark, dir, expr("doc_id DIV 2")))
        .select(col("a").as("doc_a"), col("b").as("doc_b"))
        // label propagation is iterative: without an eager checkpoint
        // every round would re-run the plant + decode + banded join
        // (wordClusters feeds Components a MATERIALIZED pair table; a
        // live pipeline must checkpoint at the same seam)
        .localCheckpoint(true))

  def clustersOracle: String =
    graft.dedup.Dedup.Components.oracleOn(
      s"""SELECT a AS doc_a, b AS doc_b FROM (
         |${neardupOracle.linesIterator.map("  " + _).mkString("\n")}
         |) t""".stripMargin)

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_image_dhash" -> ((s, dir) => plantedDhash(s, dir, col("doc_id"))),
    "q_image_neardup" -> ((s, dir) => hammingPairs(
      plantedDhash(s, dir, expr("doc_id DIV 2")))),
    "q_image_clusters" -> ((s, dir) => clusters(s, dir)))

  def oracleSql: Map[String, String] = Map(
    "q_image_dhash" -> dhashOracle,
    "q_image_neardup" -> neardupOracle,
    "q_image_clusters" -> clustersOracle)
}
