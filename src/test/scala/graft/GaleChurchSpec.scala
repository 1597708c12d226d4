package graft

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.catalyst.util.GenericArrayData
import graft.plans.GaleChurchAlign
import graft.text.ParallelText

class GaleChurchSpec extends SparkSuite {

  private def beads(a: Seq[Int], b: Seq[Int]): Seq[(Int, Int, Int, Int)] = {
    val out = GaleChurchAlign.align(
      new GenericArrayData(a.toArray), new GenericArrayData(b.toArray))
    (0 until out.numElements()).map { i =>
      val r = out.getStruct(i, 4)
      (r.getInt(0), r.getInt(1), r.getInt(2), r.getInt(3))
    }
  }

  test("equal-length documents align as all 1-1 beads") {
    assert(beads(Seq(20, 30, 40), Seq(20, 30, 40)) ==
      Seq((0, 1, 0, 1), (1, 1, 1, 1), (2, 1, 2, 1)))
  }

  test("a merged pair on the b side yields a 2-1 bead") {
    assert(beads(Seq(20, 30, 40, 50), Seq(20, 70, 50)) ==
      Seq((0, 1, 0, 1), (1, 2, 1, 1), (3, 1, 2, 1)))
  }

  test("a split pair on the b side yields a 1-2 bead") {
    assert(beads(Seq(20, 70, 50), Seq(20, 30, 40, 50)) ==
      Seq((0, 1, 0, 1), (1, 1, 1, 2), (2, 1, 3, 1)))
  }

  test("an inserted long segment yields a 0-1 bead, a deleted one 1-0") {
    // the extra segment is longer than SkipPenalty + MergePenalty, so a
    // 1-2 merge into the neighbor can never undercut the honest skip
    assert(beads(Seq(20, 30), Seq(20, 30, 90)) ==
      Seq((0, 1, 0, 1), (1, 1, 1, 1), (2, 0, 2, 1)))
    assert(beads(Seq(20, 30, 90), Seq(20, 30)) ==
      Seq((0, 1, 0, 1), (1, 1, 1, 1), (2, 1, 2, 0)))
  }

  test("a SHORT inserted segment merges into its neighbor instead (documented trade)") {
    // |50 - 50 - 17| + MergePenalty = 19 < SkipPenalty: the DP prefers
    // the 1-2 merge — the Gale–Church behavior for fragment-sized
    // insertions (they usually ARE part of the neighboring sentence)
    assert(beads(Seq(20, 50), Seq(20, 50, 17)) ==
      Seq((0, 1, 0, 1), (1, 1, 1, 2)))
  }

  test("empty sides produce pure skip runs") {
    assert(beads(Nil, Seq(10, 20)) == Seq((0, 0, 0, 1), (0, 0, 1, 1)))
    assert(beads(Seq(10, 20), Nil) == Seq((0, 1, 0, 0), (1, 1, 0, 0)))
    assert(beads(Nil, Nil) == Nil)
  }

  test("misaligned lengths pay their mismatch: the cheapest path wins, deterministically") {
    // a=[10,90], b=[90]: best is 1-0 (drop 10) + 1-1 (90↔90) = 50;
    // alternatives: 2-1 (|100-90|+2=12) — cheaper! the merge wins
    assert(beads(Seq(10, 90), Seq(90)) == Seq((0, 2, 0, 1)))
    // but when the merge overshoots badly, the skip is chosen:
    // 2-1 = |80+90-90|+2 = 82 > 1-0(50) + 1-1(0)
    assert(beads(Seq(80, 90), Seq(90)) == Seq((0, 1, 0, 0), (1, 1, 0, 1)))
  }

  test("q_hreflang_align: ZERO exchanges (map + explode only) and bead classes verified") {
    val df = ParallelText.hreflangAligned(spark, Sf)
    val plan = df.queryExecution.executedPlan.toString
    // no key shuffle anywhere: the only exchange is the widen's
    // round-robin work-spreader under the per-row plant
    assert(!plan.contains("Exchange hashpartitioning"), plan)
    assert(!plan.contains("Exchange rangepartitioning"), plan)
    assert("Exchange ".r.findAllIn(plan).size == 1, plan)

    val rows = df.collect()
    // every cluster pairs en against de and fr
    val byPair = rows.groupBy(r => (r.getLong(0), r.getString(2)))
    byPair.foreach { case ((cluster, langB), bs) =>
      val c = cluster % 3
      val o = (cluster % 7).toInt
      val lens = (0 to 3).map(j => 20 + 10 * j + o)
      val nBeads = if (langB == "fr") 4 else if (c == 1) 3 else if (c == 2) 5 else 4
      assert(bs.length == nBeads, s"cluster $cluster $langB")
      if (langB == "de" && c == 1) {
        assert(bs.map(r => (r.getInt(4), r.getInt(5), r.getInt(6), r.getInt(7))).toSet ==
          Set((0, 1, 0, 1), (1, 2, 1, 1), (3, 1, 2, 1)))
        // the 2-1 bead's pair text: two en segments vs one merged de segment
        val b1 = bs.find(_.getInt(5) == 2).get
        assert(b1.getString(8) == "e" * (lens(1) + lens(2)))
        assert(b1.getString(9) == "d" * (lens(1) + lens(2)))
      }
      if (langB == "de" && c == 2) {
        val ins = bs.find(_.getInt(5) == 0).get
        assert(ins.getInt(4) == 4 && ins.getInt(7) == 1)
        assert(ins.getString(8) == "")
        assert(ins.getString(9) == "d" * ParallelText.ExtraSegLen)
      }
      if (langB == "fr")
        assert(bs.map(r => (r.getInt(4), r.getInt(6))).toSeq.sorted ==
          Seq((0, 0), (1, 1), (2, 2), (3, 3)))
    }
  }
}
