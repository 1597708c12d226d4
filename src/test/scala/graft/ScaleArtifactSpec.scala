package graft

import org.scalatest.funsuite.AnyFunSuite

/** Gate on the scale-probe artifact: every registered query's measured
  * 10×/1× growth must stay under [[ScaleProbe.GrowthBound]]. The artifact
  * is produced out-of-band (`sbt "runMain graft.ScaleProbe"` — minutes of
  * wall-clock, not a unit-test workload); when it is absent the test is
  * canceled, not passed, so CI output still shows the probe is pending.
  */
class ScaleArtifactSpec extends AnyFunSuite {

  private def latestArtifact: Option[java.io.File] = {
    val dir = new java.io.File(".")
    Option(dir.listFiles((_, n) => n.matches("SCALE_r\\d+\\.json")))
      .map(_.toSeq).getOrElse(Seq.empty)
      // numeric round order — lexicographic would rank r99 above r100
      .sortBy(f => "\\d+".r.findFirstIn(f.getName).get.toInt)
      .lastOption
  }

  test("the latest artifact covers the ENTIRE query registry") {
    // a truncated probe reads as "everything scales" — absence must fail
    // loudly (SCALE_r07 silently lacked q12_priority_classes, which
    // landed after that round's final probe run)
    val f = latestArtifact
    assume(f.isDefined, "no SCALE_r*.json artifact; run graft.ScaleProbe")
    val txt = java.nio.file.Files.readString(f.get.toPath)
    val missing = SparkEntry.queries.keySet.filterNot(q => txt.contains("\"" + q + "\""))
    assert(missing.isEmpty,
      s"registered queries missing from ${f.get.getName}: ${missing.toSeq.sorted.mkString(", ")}" +
        " — regenerate the artifact (sbt \"runMain graft.ScaleProbe SCALE_r<N>.json\")")
  }

  test("no registered query exceeds the configured growth bound at 10x data") {
    val f = latestArtifact
    assume(f.isDefined, "no SCALE_r*.json artifact; run graft.ScaleProbe")
    val txt = java.nio.file.Files.readString(f.get.toPath)
    assert(!txt.contains("\"error\""), s"probe recorded failures in ${f.get.getName}")
    val offenders = "\"(q_[a-z0-9_]+)\": \\{[^}]*\"super_linear\": true".r
      .findAllMatchIn(txt).map(_.group(1)).toSeq
    assert(offenders.isEmpty,
      s"super-linear growth flagged in ${f.get.getName}: ${offenders.mkString(", ")}")
  }
}
