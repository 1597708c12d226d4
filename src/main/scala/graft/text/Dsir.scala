package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** DSIR-style importance weighting for data selection (Xie et al. 2023,
  * "Data Selection for Language Models via Importance Resampling"): score
  * every document by how much more likely its hashed n-gram bag is under
  * a TARGET distribution (here: the English sub-corpus) than under the
  * RAW corpus, then keep the top slice per language. The weight is the
  * standard bag-of-features log-likelihood ratio
  *
  *   w(x) = Σ_f  [ log p_target(bucket(f)) − log p_raw(bucket(f)) ]
  *
  * over unigram + bigram features hashed into [[Buckets]] buckets with
  * add-1 smoothing — exactly DSIR's hashed n-gram generative model.
  *
  * Exactness: each log₂ is msb-quantized SEPARATELY
  * (`msb(cnt+1) − msb(total+B)` per corpus — never a cross-product of
  * counts, so nothing overflows at any corpus size) with
  * `msb(x) = length(bin(x))`, the X86 discipline; the bucket hash is the
  * repo-wide md5-fold idiom stated identically in both engines. Scores
  * are BIGINT "bits", bit-equal across engines.
  *
  * Scale: features explode per token (shuffle-free), the bucket model is
  * [[Buckets]] rows + a one-row total — both BROADCAST back onto the
  * feature stream; raw and target counts come from ONE pass (conditional
  * aggregation, not two corpus scans), and the feature subtree is shared
  * between the model build and the scoring join so AQE computes it once
  * (spec-pinned ReusedExchange). Selection reuses the X95 histogram
  * quantile per language — no global sort anywhere.
  */
object Dsir {

  /** Hashed feature space size — DSIR uses 10⁴; 256 keeps the fixture's
    * buckets densely populated so smoothing paths are exercised.
    */
  val Buckets = 256L

  val TargetLang = "en"

  val Salt = "#dsir"

  /** Features of one doc: every token (unigram) plus every adjacent pair
    * (bigram, space-joined) — (doc_id, lang, f) rows.
    */
  private def features(docs: DataFrame): DataFrame = {
    val toks = docs.select(col("doc_id"), col("lang"),
      posexplode(TextOps.tokenize(col("text"))).as(Seq("pos", "t")))
    val byPos = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    toks.withColumn("prev", lag(col("t"), 1).over(byPos))
      .select(col("doc_id"), col("lang"),
        explode(when(col("prev").isNull, array(col("t")))
          .otherwise(array(col("t"), concat(col("prev"), lit(" "), col("t")))))
          .as("f"))
  }

  private def bucketOf(f: org.apache.spark.sql.Column) =
    conv(substring(md5(concat(f, lit(Salt))), 1, 12), 16, 10).cast("long") % Buckets

  private def msb(c: org.apache.spark.sql.Column) = length(bin(c)).cast("long")

  /** (doc_id, lang, n_feats, weight_bits) for every doc with ≥1 token. */
  def importanceWeights(spark: SparkSession, dir: String): DataFrame =
    importanceWeightsOf(Tables.documents(spark, dir))

  def importanceWeightsOf(docs: DataFrame): DataFrame = {
    val feats = features(docs).withColumn("bucket", bucketOf(col("f")))
    val isTarget = (col("lang") === TargetLang).cast("long")
    val model = feats.groupBy(col("bucket"))
      .agg(count(lit(1)).as("cnt_r"), sum(isTarget).as("cnt_t"))
    val totals = feats.agg(count(lit(1)).as("tot_r"), sum(isTarget).as("tot_t"))
    feats
      .join(broadcast(model), "bucket")
      .crossJoin(broadcast(totals))
      .withColumn("bits",
        msb(col("cnt_t") + 1L) - msb(col("tot_t") + Buckets)
          - msb(col("cnt_r") + 1L) + msb(col("tot_r") + Buckets))
      .groupBy(col("doc_id"), col("lang"))
      .agg(count(lit(1)).as("n_feats"),
        sum(col("bits")).cast("long").as("weight_bits"))
  }

  /** The features CTE + scoring, shared by both oracle queries. Yields
    * columns (doc_id, lang, n_feats, weight_bits).
    */
  private def weightsSql: String = {
    val fold = TextOps.md5HexFold12Sql("d")
    s"""WITH arrs AS (
       |  SELECT doc_id, lang, ${TextOps.tokenizeSql("text")} AS tks FROM documents
       |), toks AS (
       |  SELECT doc_id, lang, i - 1 AS pos, tks[i] AS t
       |  FROM arrs, unnest(range(1, len(tks) + 1)) AS u(i)
       |), ctx AS (
       |  SELECT doc_id, lang, t,
       |    lag(t) OVER (PARTITION BY doc_id ORDER BY pos) AS prev
       |  FROM toks
       |), feats AS (
       |  SELECT doc_id, lang, t AS f FROM ctx
       |  UNION ALL
       |  SELECT doc_id, lang, prev || ' ' || t AS f FROM ctx WHERE prev IS NOT NULL
       |), bf AS (
       |  SELECT doc_id, lang, ($fold) % $Buckets AS bucket
       |  FROM (SELECT doc_id, lang, md5(f || '$Salt') AS d FROM feats)
       |), model AS (
       |  SELECT bucket, CAST(count(*) AS BIGINT) AS cnt_r,
       |    CAST(sum(CASE WHEN lang = '$TargetLang' THEN 1 ELSE 0 END) AS BIGINT) AS cnt_t
       |  FROM bf GROUP BY bucket
       |), tot AS (
       |  SELECT CAST(count(*) AS BIGINT) AS tot_r,
       |    CAST(sum(CASE WHEN lang = '$TargetLang' THEN 1 ELSE 0 END) AS BIGINT) AS tot_t
       |  FROM bf
       |), scored AS (
       |  SELECT doc_id, lang,
       |    length(bin(cnt_t + 1)) - length(bin(tot_t + $Buckets))
       |      - length(bin(cnt_r + 1)) + length(bin(tot_r + $Buckets)) AS bits
       |  FROM bf JOIN model USING (bucket) CROSS JOIN tot
       |)
       |SELECT doc_id, lang, CAST(count(*) AS BIGINT) AS n_feats,
       |  CAST(sum(bits) AS BIGINT) AS weight_bits
       |FROM scored GROUP BY doc_id, lang""".stripMargin
  }

  def importanceWeightsOracle: String = weightsSql

  /** DSIR's deterministic selection twin: keep documents at or above
    * their LANGUAGE's 75th weight percentile (the [[graft.ops.Quantiles]]
    * histogram selection — no global sort), so every language retains its
    * own top slice instead of the target language crowding out the rest.
    */
  def selectTop(spark: SparkSession, dir: String): DataFrame =
    selectTopOf(Tables.documents(spark, dir))

  def selectTopOf(docs: DataFrame): DataFrame = {
    val weights = importanceWeightsOf(docs)
    val thresholds = graft.ops.Quantiles
      .grouped(weights, col("lang"), col("weight_bits"))
      .select(col("k").as("lang"), col("p75").as("threshold"))
    weights.join(broadcast(thresholds), "lang")
      .filter(col("weight_bits") >= col("threshold"))
      .select(col("doc_id"), col("lang"), col("weight_bits"), col("threshold"))
  }

  def selectTopOracle: String = {
    val quant = graft.ops.Quantiles.groupedSql(
      s"SELECT lang AS k, weight_bits AS v FROM w")
    s"""WITH w AS ($weightsSql),
       |thr AS (
       |  SELECT k AS lang, p75 AS threshold FROM ($quant)
       |)
       |SELECT doc_id, w.lang, weight_bits, threshold
       |FROM w JOIN thr ON thr.lang = w.lang
       |WHERE weight_bits >= threshold""".stripMargin
  }

  /** The bucket model as a driver artifact for the stream edge: bits per
    * bucket, plus the smoothed default for buckets the training corpus
    * never hit (cnt_r = cnt_t = 0 ⇒ msb(1) terms cancel to the totals
    * difference). 256 rows by construction — the model-collect
    * discipline.
    */
  def collectModel(spark: SparkSession, dir: String): (Map[Long, Long], Long) =
    collectModelOf(Tables.documents(spark, dir))

  def collectModelOf(docs: DataFrame): (Map[Long, Long], Long) = {
    val feats = features(docs).withColumn("bucket", bucketOf(col("f")))
    val isTarget = (col("lang") === TargetLang).cast("long")
    val rows = feats.groupBy(col("bucket"))
      .agg(count(lit(1)).as("cnt_r"), sum(isTarget).as("cnt_t"))
      .crossJoin(broadcast(
        feats.agg(count(lit(1)).as("tot_r"), sum(isTarget).as("tot_t"))))
      .select(col("bucket"),
        (msb(col("cnt_t") + 1L) - msb(col("tot_t") + Buckets)
          - msb(col("cnt_r") + 1L) + msb(col("tot_r") + Buckets)).as("bits"),
        (msb(lit(1L)) - msb(col("tot_t") + Buckets)
          - msb(lit(1L)) + msb(col("tot_r") + Buckets)).as("dflt"))
      .collect()
    (rows.map(r => r.getLong(0) -> r.getLong(1)).toMap, rows.head.getLong(2))
  }

  /** Streaming ingest scorer — the [[importanceWeights]] verdict as ONE
    * stateless per-row expression over a FROZEN model (no explode, no
    * window, no aggregate, no state store): unigrams+bigrams rebuilt
    * with slice/zip_with (identical adjacent-pair content to the batch
    * lag window), each feature md5-bucketed in-expression and looked up
    * in the literal model map with the smoothed default for unseen
    * buckets. Docs with no tokens have no features and are dropped —
    * the batch contract (absent = no verdict). `DsirSpec` pins the
    * stream score equal to the batch gate's per doc.
    */
  def scoreStream(docs: DataFrame, model: Map[Long, Long], dflt: Long): DataFrame = {
    val ks = model.keys.toArray.sorted
    val wmap = map_from_arrays(lit(ks), lit(ks.map(model)))
    val toks = TextOps.tokenize(col("text"))
    val n = size(toks)
    val bigrams = zip_with(slice(toks, lit(1), greatest(n - 1, lit(0))),
      slice(toks, lit(2), greatest(n - 1, lit(0))),
      (a, b) => concat(a, lit(" "), b))
    val bitsArr = transform(concat(toks, bigrams),
      f => coalesce(element_at(wmap, bucketOf(f)), lit(dflt)))
    // bind the bits array ONCE as a lambda variable (the CollapseProject
    // HOF-inlining trap — Phrases.mergeTokens documents the failure mode)
    val scored = element_at(transform(array(bitsArr), a =>
      struct(size(a).cast("long").as("n_feats"),
        aggregate(a, lit(0L), (acc, v) => acc + v).as("weight_bits"))), 1)
    docs
      .withColumn("s", scored)
      .filter(col("s.n_feats") > 0)
      .select(col("doc_id"), col("lang"),
        col("s.n_feats").as("n_feats"), col("s.weight_bits").as("weight_bits"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_dsir_weights" -> ((s, dir) => importanceWeights(s, dir)),
    "q_dsir_select" -> ((s, dir) => selectTop(s, dir))
  )

  def oracleSql: Map[String, String] = Map(
    "q_dsir_weights" -> importanceWeightsOracle,
    "q_dsir_select" -> selectTopOracle
  )
}
