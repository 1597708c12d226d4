package graft

import org.apache.spark.sql.Row
import org.scalatest.Assertions._

/** Shared assertion for every politeness-schedule surface
  * (fetchSchedule / crawlSchedule / Frontier.recrawl): within each
  * host, `seq` is contiguous from 1 and `not_before_ms` is the running
  * sum of the PRIOR fetches' delays — with the delay recomputed from
  * the shared robots plant (500 ms for doc_id%3==0, else 2000 ms).
  * One definition, so a fixture change fails here once instead of in
  * three copy-pasted spec blocks.
  */
object ScheduleChecks {

  def plantDelayMs(docId: Long): Long = if (docId % 3 == 0) 500L else 2000L

  def assertPoliteSchedule(rows: Seq[Row]): Unit = {
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[String]("host")).foreach { case (host, hs) =>
      val sorted = hs.sortBy(_.getAs[Int]("seq"))
      assert(sorted.head.getAs[Int]("seq") == 1 &&
        sorted.head.getAs[Long]("not_before_ms") == 0L, host)
      sorted.sliding(2).foreach {
        case Seq(a, b) =>
          assert(b.getAs[Int]("seq") == a.getAs[Int]("seq") + 1 &&
            b.getAs[Long]("not_before_ms") ==
              a.getAs[Long]("not_before_ms") +
                plantDelayMs(a.getAs[Long]("doc_id")),
            s"$host seq ${b.getAs[Int]("seq")}")
        case _ =>
      }
    }
  }
}
