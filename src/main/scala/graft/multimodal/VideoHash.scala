package graft.multimodal

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** VIDEO perceptual dedup (X220) — the member that completes the
  * near-dup family across modalities (text MinHash X2, image dHash
  * X191, audio envelope X212, now moving pictures): per-frame dHash
  * signatures over REAL decoded MJPEG/AVI streams plus the banded
  * joint-Hamming join that finds re-encodes and container rewraps
  * without an all-pairs pass. Duplicate videos dominate crawled media
  * the same way duplicate text dominates crawled pages; a curation
  * pipeline runs exactly this before sampling training frames.
  *
  * The fingerprint is [[graft.plans.AviDhash]]: every frame through
  * the ONE [[graft.plans.DhashCore]] grid (the same integer arithmetic
  * as the still-image and cross-format gates, so a video's first frame
  * hashes identically to the same raster shipped as a bare JPEG).
  * Matching is FRAME-ALIGNED: distance(a, b) = Σ_f bit_count(sig_a(f)
  * XOR sig_b(f)) — a re-encode flips a few bits in a few frames; a
  * different video differs everywhere.
  *
  * The gate signature packs per-frame 16-bit hashes into ONE BIGINT
  * (`Σ sig(f) << 16f` — the planted streams carry ≤ 4 frames, and
  * 4 × 16 = 64 bits exactly), so the joint distance is one
  * `bit_count(a XOR b)` and the banded join is the X191 machinery with
  * 64-bit bands and the frame count joined into the bucket key —
  * candidates must share (width, height, n_frames) and ≥ 1 of
  * maxHam+1 disjoint band values (pigeonhole: recall 1). Longer
  * videos band the signature ARRAY by frame ranges instead (md5 of
  * each slice as the bucket value, `zip_with` XOR popcount as the
  * verify) — the same algebra, declared as the >4-frame extension.
  * Videos never shuffle; only (id, w, h, n, 8-byte signature) rows do.
  */
object VideoHash {

  /** Gate grid per frame: 4×4 → 16 bits; packed cap 4 frames; joint
    * Hamming threshold 3 — one re-encode-grade bit flip per frame.
    */
  val GW = ImageHash.GW
  val GH = ImageHash.GH
  val MaxHam = ImageHash.MaxHam
  val PackFrames = 4

  def aviDhashOf(content: Column, gw: Int = GW, gh: Int = GH): Column =
    org.apache.spark.sql.GraftColumnShim.column(graft.plans.AviDhash(
      org.apache.spark.sql.GraftColumnShim.expression(content), gw, gh))

  /** (media_id, width, height, n_frames, f, dhash) — one row per
    * frame over AviPlant(seed) streams: the per-frame table a frame
    * sampler or per-frame quality filter reads.
    */
  def plantedFrameDhash(spark: SparkSession, dir: String, seed: Column): DataFrame =
    graft.ops.ScaleOps.widen(Tables.documents(spark, dir))
      .select(col("doc_id").as("media_id"),
        org.apache.spark.sql.GraftColumnShim.column(graft.plans.AviPlant(
          org.apache.spark.sql.GraftColumnShim.expression(seed))).as("content"))
      .select(col("media_id"), aviDhashOf(col("content")).as("s"))
      .filter(col("s").isNotNull)
      .select(col("media_id"), col("s").getField("width").as("width"),
        col("s").getField("height").as("height"),
        col("s").getField("n_frames").as("n_frames"),
        posexplode(col("s").getField("sig")).as(Seq("f", "dhash")))

  /** (media_id, width, height, n_frames, dhash): the PACKED signature
    * table — per-frame hashes folded into one BIGINT; streams longer
    * than [[PackFrames]] are ABSENT from the packed table (they ride
    * the array form).
    */
  def packedSignatures(spark: SparkSession, dir: String, seed: Column): DataFrame =
    plantedFrameDhash(spark, dir, seed)
      .groupBy(col("media_id"), col("width"), col("height"), col("n_frames"))
      .agg(sum(expr("shiftleft(dhash, 16 * f)")).as("dhash"))
      .filter(col("n_frames") <= PackFrames)

  /** Video near-dup pairs: the X191 banded join with 64-bit bands and
    * the frame count in the bucket key. (a, b, hamming) with hamming
    * the joint frame-aligned distance.
    *
    * FEATURELESS media (all-zero signature — every frame gradient-flat:
    * solid-color test cards, black leaders) are excluded BEFORE the
    * join: a featureless video matches every other featureless video
    * in its dimension class, so the pair list grows quadratically in
    * content that carries no near-dup evidence — the video twin of the
    * ubiquitous-fingerprint cap the X43 winnowing join applies, and of
    * stopword removal before token joins. A production pipeline routes
    * featureless media to its own (linear) bucket report instead.
    */
  def nearDupPairs(spark: SparkSession, dir: String): DataFrame =
    ImageHash.hammingPairs(
      packedSignatures(spark, dir, expr("doc_id DIV 2"))
        .filter(col("dhash") =!= 0L),
      bits = 16 * PackFrames, maxHam = MaxHam,
      keyCols = Seq("width", "height", "n_frames"))

  // ---- oracles: every frame-hash bit recomputed from the planted
  // block formulas (pixel (x,y) of frame f of doc s is the DC-exact
  // value (s·37 + f·101 + k·59) mod 256 for block k — JpegPlant
  // .encodeFrame's salt arithmetic, already pinned by q_video_frames).

  private def videoSigSql(seedSql: String): String =
    s"""vdims AS (
       |  SELECT doc_id, $seedSql AS s,
       |    8 * (1 + ($seedSql) % 4) AS w, 8 * (1 + ($seedSql) % 3) AS h,
       |    2 + ($seedSql) % 3 AS nf
       |  FROM documents),
       |vpx AS (
       |  SELECT doc_id, w, h, nf, f, i % w AS x, i // w AS y,
       |    (s * 37 + f * 101 + (((i // w) // 8) * (w // 8) + (i % w) // 8) * 59) % 256 AS v
       |  FROM vdims, unnest(range(0, nf)) AS uf(f), unnest(range(0, w * h)) AS u(i)),
       |vcells AS (
       |  SELECT doc_id, w, h, nf, f, rr, c, sum(gray) // count(*) AS av FROM (
       |    SELECT doc_id, w, h, nf, f, (y * $GH) // h AS rr, (x * ($GW + 1)) // w AS c,
       |      (299 * v + 587 * v + 114 * v) // 1000 AS gray
       |    FROM vpx) GROUP BY doc_id, w, h, nf, f, rr, c),
       |vfh AS (
       |  SELECT l.doc_id AS media_id, l.w, l.h, l.nf, l.f,
       |    CAST(coalesce(sum(CASE WHEN l.av > r2.av
       |        THEN 1::BIGINT << (l.rr * $GW + l.c) ELSE 0 END), 0) AS BIGINT)
       |      AS dhash
       |  FROM vcells l JOIN vcells r2
       |    ON l.doc_id = r2.doc_id AND l.f = r2.f AND l.rr = r2.rr AND r2.c = l.c + 1
       |  GROUP BY l.doc_id, l.w, l.h, l.nf, l.f)""".stripMargin

  def frameDhashOracle: String =
    s"""WITH ${videoSigSql("doc_id")}
       |SELECT media_id, CAST(w AS INTEGER) AS width, CAST(h AS INTEGER) AS height,
       |  CAST(nf AS INTEGER) AS n_frames, CAST(f AS INTEGER) AS f, dhash
       |FROM vfh""".stripMargin

  def nearDupOracle: String =
    s"""WITH ${videoSigSql("doc_id // 2")},
       |vsig AS (
       |  -- frame 3's hash lands on bits 48-63 incl. the sign bit: Spark's
       |  -- shiftleft wraps silently, DuckDB errors on BIGINT overflow, so
       |  -- the pack runs in HUGEINT and re-biases into signed 64-bit —
       |  -- bit-identical to the Spark wrap (probe-verified)
       |  SELECT media_id, w, h, nf,
       |    CAST((sum(CAST(dhash AS HUGEINT) * (1::HUGEINT << CAST(16 * f AS INTEGER)))
       |      + 9223372036854775808::HUGEINT) % 18446744073709551616::HUGEINT
       |      - 9223372036854775808::HUGEINT AS BIGINT) AS vhash
       |  FROM vfh GROUP BY media_id, w, h, nf)
       |SELECT x.media_id AS a, y.media_id AS b,
       |  CAST(bit_count(xor(x.vhash, y.vhash)) AS BIGINT) AS hamming
       |FROM vsig x JOIN vsig y
       |  ON x.w = y.w AND x.h = y.h AND x.nf = y.nf AND x.media_id < y.media_id
       |WHERE x.vhash <> 0 AND y.vhash <> 0
       |  AND bit_count(xor(x.vhash, y.vhash)) <= $MaxHam""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_video_dhash" -> ((s, dir) =>
      plantedFrameDhash(s, dir, col("doc_id"))
        .select(col("media_id"), col("width"), col("height"),
          col("n_frames"), col("f").cast("int").as("f"), col("dhash"))),
    "q_video_neardup" -> ((s, dir) => nearDupPairs(s, dir)))

  def oracleSql: Map[String, String] = Map(
    "q_video_dhash" -> frameDhashOracle,
    "q_video_neardup" -> nearDupOracle)
}
