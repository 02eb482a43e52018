package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.log.Compaction
import graft.projection.EventsReplay
import graft.snapshot.Snapshot

/** Log compaction over the multi-tx, retraction-bearing events store:
  * the head state must survive the rewrite exactly while the store
  * shrinks and later reads drop the latest-wins shuffle. */
class CompactionSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private lazy val original = EventsReplay.snapshot(spark, dir).store
  private lazy val compacted = Compaction.compact(spark, original)

  test("head currentFacts survive compaction exactly") {
    def factSet(s: Snapshot) = s.currentFacts
      .collect().map(_.toSeq).toSet
    assert(factSet(new Snapshot(compacted)) == factSet(new Snapshot(original)))
  }

  test("the store strictly shrinks when history exists") {
    val before = original.factsDF.count()
    val after = compacted.factsDF.count()
    assert(after < before, s"expected shrink, got $before -> $after")
    // retractions are gone entirely
    assert(compacted.factsDF.where(!col("added")).count() == 0)
  }

  test("compacted snapshots skip the latest-wins aggregation") {
    assert(compacted.preDeduped)
    val plan = new Snapshot(compacted).currentFacts
      .queryExecution.optimizedPlan.toString
    assert(!plan.contains("max_by"), s"latest-wins survived compaction:\n$plan")
  }

  test("per-element max time id is preserved") {
    def timeIds(st: graft.log.FactStore) =
      graft.temporal.VersionChains.timeIds(st)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(timeIds(compacted) == timeIds(original))
  }

  test("version chains collapse to a single version per element") {
    val counts = graft.temporal.VersionChains.versionCounts(compacted)
      .collect().map(_.getLong(1)).toSet
    assert(counts == Set(1L))
  }
}
