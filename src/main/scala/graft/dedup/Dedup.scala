package graft.dedup

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.text.{Analysis, TextOps}

/** Deduplication operators over the `documents` table — the dedup family a
  * training-data pipeline needs, each designed bucket-first so no stage is
  * ever all-pairs:
  *
  *   - [[Exact]]: fingerprint (md5 of normalized text) + keep-first window,
  *     partitioned BY the fingerprint — duplicates hash to one task, work is
  *     proportional to group sizes, never n².
  *   - [[MinHashLSH]]: word-3-gram shingles → k MinHash values → banded LSH
  *     buckets → candidate pairs joined ONLY within buckets → exact Jaccard
  *     verify. The classic sub-quadratic near-dup join.
  *   - [[SimHash]]: per-document 16-bit SimHash signature from token-hash
  *     bit votes — a per-row, shuffle-free sketch whose Hamming distance
  *     approximates cosine/Jaccard similarity.
  *
  * Cross-engine exactness: every hash is md5-as-hex-string (identical in
  * Spark and DuckDB) and every MinHash min is a STRING min — so the DuckDB
  * oracle replicates the LSH bucketing bit-for-bit, and the correctness
  * gate checks the real bucketed plan, not a brute-force stand-in.
  */
object Dedup {

  /** Distinct word-3-gram shingles of the whitespace tokenization. Both
    * engines build `tk[i] ⧺ ' ' ⧺ tk[i+1] ⧺ ' ' ⧺ tk[i+2]` for i in
    * 1..n-2 (1-based), empty for n < 3.
    *
    * PERF: formulated as `zip_with` over three `slice`s of the token array,
    * NOT `transform(sequence(...), i => element_at(tk, i) ...)`. Catalyst
    * substitutes a lambda-captured expression tree wholesale, so an
    * element_at formulation re-runs the full regex tokenization for every
    * element access — O(shingles × tokens) work per row (measured 20×
    * slowdown at sf0.1). With slice/zip_with the token array is evaluated a
    * constant number of times per row and lambda bodies touch only their
    * lambda arguments.
    */
  def shingles(c: Column): Column = {
    val tk = TextOps.tokenize(c)
    val len = greatest(size(tk) - 2, lit(0))
    val pairs = zip_with(slice(tk, lit(1), len), slice(tk, lit(2), len),
      (a, b) => concat(a, lit(" "), b))
    array_distinct(zip_with(pairs, slice(tk, lit(3), len),
      (ab, cc) => concat(ab, lit(" "), cc)))
  }

  def shinglesSql(c: String): String = {
    val tk = TextOps.tokenizeSql(c)
    s"""list_distinct(list_transform(range(1, greatest(len($tk) - 1, 1)),
       | i -> ($tk)[i] || ' ' || ($tk)[i+1] || ' ' || ($tk)[i+2]))""".stripMargin.replace("\n", "")
  }

  /** Distinct character n-gram shingles — the sub-word near-dup signal
    * (robust to token-boundary edits). Lambda bodies only reference the
    * raw string column (an O(1) attribute read), so the per-element
    * substring carries none of the recompute trap documented on
    * [[shingles]].
    */
  def charShingles(c: Column, n: Int): Column = {
    val idx = when(length(c) >= n, sequence(lit(1), length(c) - (n - 1)))
      .otherwise(array().cast("array<int>"))
    array_distinct(transform(idx, i => c.substr(i, lit(n))))
  }

  def charShinglesSql(c: String, n: Int): String =
    s"list_distinct(list_transform(range(1, greatest(length($c) - ${n - 2}, 1)), i -> substring($c, i, $n)))"

  /** Exact set Jaccard of two shingle-set columns: |∩| / |∪| as the ratio
    * of two integers — bit-identical across engines.
    */
  def jaccard(a: Column, b: Column): Column =
    size(array_intersect(a, b)).cast("double") / size(array_union(a, b))

  object Exact {
    /** Keep-first per content fingerprint. Window partitions BY the hash:
      * at 100 TB each fingerprint's (tiny) group sorts independently.
      */
    def dedupExact(docs: DataFrame): DataFrame = {
      val fp = docs.select(col("doc_id"), Analysis.fingerprint(col("text")).as("fp_md5"))
      val w = Window.partitionBy(col("fp_md5")).orderBy(col("doc_id"))
      fp.withColumn("rn", row_number().over(w)).filter(col("rn") === 1).drop("rn")
    }

    def oracle: String =
      s"""SELECT doc_id, md5(${graft.text.Normalize.normalizeSql("text")}) AS fp_md5
         |FROM documents
         |QUALIFY row_number() OVER (
         |  PARTITION BY md5(${graft.text.Normalize.normalizeSql("text")})
         |  ORDER BY doc_id) = 1""".stripMargin
  }

  /** LSH shape: k = bands·rowsPerBand MinHashes; a pair is a candidate iff
    * one band of `rowsPerBand` consecutive hashes matches entirely. More
    * rows per band → sharper threshold (fewer background candidates, the
    * knob that keeps the join sub-quadratic when background similarity is
    * high); more bands → higher recall at the target threshold.
    */
  case class LshConfig(bands: Int, rowsPerBand: Int, threshold: Double) {
    val numHashes: Int = bands * rowsPerBand
  }

  object MinHashLSH {
    /** Word-3-gram shingles: background Jaccard ≈ 0, planted near-dups
      * ≥ 0.9 → loose 4×2 bands suffice.
      */
    val WordConfig: LshConfig = LshConfig(bands = 4, rowsPerBand = 2, threshold = 0.8)

    /** Char-5-gram shingles share sub-word fragments across ordinary
      * documents (background Jaccard ≈ 0.2-0.3), so bands are 4 rows deep:
      * P(candidate | j=0.25) ≈ 4·0.25⁴ ≈ 1.6% while j=0.95 pairs still
      * collide with ≥ 99.8% probability.
      */
    val CharConfig: LshConfig = LshConfig(bands = 4, rowsPerBand = 4, threshold = 0.8)

    // word-shingle aliases (the original public surface)
    val NumHashes: Int = WordConfig.numHashes
    val Bands: Int = WordConfig.bands
    val RowsPerBand: Int = WordConfig.rowsPerBand
    val Threshold: Double = WordConfig.threshold

    /** MinHash i = MIN over shingles of md5("i:" ⧺ shingle) — a string min
      * over identical hex digests, so both engines agree exactly.
      */
    def minhashSig(sh: Column, cfg: LshConfig = WordConfig): Seq[Column] =
      (0 until cfg.numHashes).map { i =>
        array_min(transform(sh, x => md5(concat(lit(s"$i:"), x)))).as(s"h$i")
      }

    /** Band j = md5 of its r concatenated signature values. */
    def bandHash(j: Int, cfg: LshConfig = WordConfig): Column =
      md5(concat_ws("|",
        (0 until cfg.rowsPerBand).map(r => col(s"h${j * cfg.rowsPerBand + r}")): _*))

    /** (doc_id, band, band_hash) — one row per band per doc. */
    def banded(docs: DataFrame, cfg: LshConfig = WordConfig): DataFrame = {
      val sig = docs.select(col("doc_id") +: minhashSig(col("sh"), cfg): _*)
      val bandsArr = array((0 until cfg.bands).map(bandHash(_, cfg)): _*)
      sig.select(col("doc_id"), posexplode(bandsArr).as(Seq("band", "band_hash")))
    }

    /** The near-dup join over any shingle column: candidates share ≥1 LSH
      * band (joined only within (band, band_hash) buckets), then exact
      * Jaccard ≥ threshold. Shingle arrays stay OUT of the band shuffle —
      * candidates are re-joined to them by doc_id afterward, so the wide
      * data moves once.
      */
    def nearDupPairsOn(docsRaw: DataFrame, shingleCol: Column, cfg: LshConfig): DataFrame = {
      // The shingle set feeds four plan branches (both band sides, both
      // verify joins) and the band rows feed two; persist both so the
      // expensive md5/minhash work runs once, not 4× — the C1 pattern the
      // reference applies at the same fan-out points. At cluster scale the
      // same role is played by checkpointing the signature table.
      val docs = docsRaw
        .select(col("doc_id"), shingleCol.as("sh"))
        .filter(size(col("sh")) > 0)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val b = banded(docs, cfg).persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val candidates = b.as("x").join(b.as("y"),
          col("x.band") === col("y.band") && col("x.band_hash") === col("y.band_hash") &&
            col("x.doc_id") < col("y.doc_id"))
        .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
        .distinct()
      candidates
        .join(docs.select(col("doc_id").as("doc_a"), col("sh").as("sh_a")), "doc_a")
        .join(docs.select(col("doc_id").as("doc_b"), col("sh").as("sh_b")), "doc_b")
        .select(col("doc_a"), col("doc_b"), jaccard(col("sh_a"), col("sh_b")).as("jaccard"))
        .filter(col("jaccard") >= cfg.threshold)
    }

    /** Word-3-gram near-dup pairs (the original operator). */
    def nearDupPairs(spark: SparkSession, dir: String): DataFrame =
      nearDupPairsOn(Tables.documents(spark, dir), shingles(col("text")), WordConfig)

    /** Character-5-gram near-dup pairs — the n-gram Jaccard dedup family
      * member, robust to token-boundary edits.
      */
    def charGramPairs(spark: SparkSession, dir: String): DataFrame =
      nearDupPairsOn(Tables.documents(spark, dir), charShingles(col("text"), 5), CharConfig)

    def oracleOn(shingleSql: String, cfg: LshConfig): String = {
      val sigCols = (0 until cfg.numHashes).map { i =>
        s"list_aggregate(list_transform(sh, x -> md5('$i:' || x)), 'min') AS h$i"
      }.mkString(",\n    ")
      val bandCols = (0 until cfg.bands).map { j =>
        val parts = (0 until cfg.rowsPerBand)
          .map(r => s"h${j * cfg.rowsPerBand + r}").mkString(" || '|' || ")
        s"md5($parts)"
      }.mkString(", ")
      s"""WITH docs AS (
         |  SELECT doc_id, $shingleSql AS sh FROM documents
         |), nonempty AS (
         |  SELECT * FROM docs WHERE len(sh) > 0
         |), sig AS (
         |  SELECT doc_id, sh,
         |    $sigCols
         |  FROM nonempty
         |), bandarr AS (
         |  SELECT doc_id, sh, [$bandCols] AS bands FROM sig
         |), banded AS (
         |  SELECT doc_id, i - 1 AS band, bands[i] AS band_hash
         |  FROM bandarr, unnest(range(1, ${cfg.bands + 1})) AS t(i)
         |), candidates AS (
         |  SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
         |  FROM banded x JOIN banded y
         |    ON x.band = y.band AND x.band_hash = y.band_hash AND x.doc_id < y.doc_id
         |)
         |SELECT c.doc_a, c.doc_b,
         |  CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
         |    / len(list_distinct(list_concat(a.sh, b.sh))) AS jaccard
         |FROM candidates c
         |JOIN nonempty a ON a.doc_id = c.doc_a
         |JOIN nonempty b ON b.doc_id = c.doc_b
         |WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
         |    / len(list_distinct(list_concat(a.sh, b.sh))) >= ${cfg.threshold}""".stripMargin
    }

    def oracle: String = oracleOn(shinglesSql("text"), WordConfig)
    def charGramOracle: String = oracleOn(charShinglesSql("text", 5), CharConfig)
  }

  object SimHash {
    /** Signature width. 16 bits keeps the expression tree (16 md5 probes
      * per token) oracle-expressible; a production 64-bit variant belongs in
      * a custom Catalyst Expression (one md5 per token, bit-sliced).
      */
    val Bits = 16

    private val HighHex = Seq("8", "9", "a", "b", "c", "d", "e", "f")

    /** SimHash over the distinct token set: bit i is set iff the majority
      * of token hashes have bit i set (hex digit i's high bit as the bit
      * source). Per-row, shuffle-free, codegen'd.
      *
      * PERF: each token is hashed ONCE into a digest array; the 16 bit
      * counters then probe substrings of their lambda argument. Counting
      * with `filter(toks, t => …md5(t)…)` instead would inline the md5
      * into every bit's lambda — 16 digests per token (same Catalyst
      * lambda-substitution trap as [[Dedup.shingles]]).
      */
    def simhash(c: Column): Column = {
      val digests = transform(array_distinct(TextOps.tokenize(c)), t => md5(t))
      val n = size(digests)
      val bitCols = (0 until Bits).map { i =>
        val cnt = size(filter(digests, m => substring(m, i + 1, 1).isin(HighHex: _*)))
        when(cnt * 2 > n, lit(1L << i)).otherwise(lit(0L))
      }
      bitCols.reduce(_ + _).as("simhash")
    }

    def simhashSql(c: String): String = {
      val digests = s"list_transform(list_distinct(${TextOps.tokenizeSql(c)}), t -> md5(t))"
      val hexList = HighHex.map(h => s"'$h'").mkString(", ")
      val bitTerms = (0 until Bits).map { i =>
        s"CASE WHEN 2 * len(list_filter(tt, m -> substring(m, ${i + 1}, 1) IN ($hexList))) > len(tt) THEN ${1L << i} ELSE 0 END"
      }.mkString(" + ")
      s"(SELECT $bitTerms FROM (SELECT $digests AS tt))"
    }

    /** Hamming distance between two signatures (for near-dup banding by
      * signature prefix at scale).
      */
    def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))
  }

  // ---- query registry ----

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_dedup_exact" -> ((s, dir) => Exact.dedupExact(Tables.documents(s, dir))),
    "q_dedup_neardup" -> ((s, dir) => MinHashLSH.nearDupPairs(s, dir)),
    "q_dedup_chargram" -> ((s, dir) => MinHashLSH.charGramPairs(s, dir)),
    "q_dedup_simhash" -> ((s, dir) =>
      Tables.documents(s, dir).select(col("doc_id"), SimHash.simhash(col("text"))))
  )

  def oracleSql: Map[String, String] = Map(
    "q_dedup_exact" -> Exact.oracle,
    "q_dedup_neardup" -> MinHashLSH.oracle,
    "q_dedup_chargram" -> MinHashLSH.charGramOracle,
    "q_dedup_simhash" ->
      s"SELECT doc_id, CAST(${SimHash.simhashSql("text")} AS BIGINT) AS simhash FROM documents"
  )
}
