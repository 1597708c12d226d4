package graft

import org.apache.spark.sql.SparkSession

/** Ad-hoc cold-cost profiler: times the named registry queries with the same
  * discipline as [[Bench]] (full-eval action, clearCache before each timed
  * run) but one query at a time, N passes, printing every pass — so a
  * regression can be bisected without a 2-minute full-bench run.
  *
  * Usage: runMain graft.Profile q_dedup_chargram q_normalize_text [passes=3]
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val (names, passes) = {
      val (qs, opts) = args.partition(!_.startsWith("passes="))
      (qs.toSeq, opts.headOption.map(_.stripPrefix("passes=").toInt).getOrElse(3))
    }
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Bench.session() // same env defaults as Bench — comparable numbers

    names.foreach { name =>
      SparkEntry.queries.get(name) match {
        case None =>
          // a mistyped/unknown arg (e.g. a path) must not crash the run
          System.err.println(s"[profile] unknown query '$name' — skipping " +
            "(names are SparkEntry.queries keys; sfDir comes from SPARK_GRAFT_SF_DIR)")
        case Some(fn) =>
          // one untimed warmup (JIT/codegen), then cold timed passes
          Bench.fullEval(fn(spark, sfDir))
          val times = (1 to passes).map { i =>
            spark.catalog.clearCache()
            val t0 = System.nanoTime()
            Bench.fullEval(fn(spark, sfDir))
            val dt = (System.nanoTime() - t0) / 1e9
            println(f"$name pass$i: $dt%.2f s")
            dt
          }
          println(f"$name MIN: ${times.min}%.2f s")
      }
    }
    spark.stop()
  }
}
