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

  test("retention compaction: every checkpoint at or after the cutoff is exact") {
    val cutoff = original.resolveTx(java.sql.Timestamp.valueOf("2024-01-10 00:00:00"))
    assert(cutoff > 0)
    val retained = Compaction.compactBefore(spark, original, cutoff)
    assert(retained.factsDF.count() < original.factsDF.count())
    val head = original.headTx
    val mid = original.resolveTx(java.sql.Timestamp.valueOf("2024-01-20 00:00:00"))
    def facts(st: graft.log.FactStore, t: Long) =
      new Snapshot(st, t).currentFacts.collect().map(_.toSeq).toSet
    Seq(cutoff, mid, head).foreach { t =>
      assert(facts(retained, t) == facts(original, t), s"asOf $t diverged")
    }
  }

  test("a compacted store survives a save/open round-trip") {
    val root = java.nio.file.Files.createTempDirectory("graft_compact_rt").toString
    compacted.save(root)
    val reopened = graft.log.FactLog.open(spark, root)
    def headFacts(st: graft.log.FactStore) =
      new Snapshot(st).currentFacts.collect().map(_.toSeq).toSet
    assert(headFacts(reopened) == headFacts(original))
    // the preDeduped contract survives the round-trip (ADVICE r6): the
    // reopened store still takes the max_by-free snapshot path
    assert(reopened.preDeduped, "preDeduped flag lost across save/open")
    val plan = new Snapshot(reopened).currentFacts
      .queryExecution.optimizedPlan.toString
    assert(!plan.contains("max_by"),
      s"latest-wins re-appeared after reopen:\n$plan")
  }

  test("profile-guided policy: compacts the history-heavy store, leaves a clean one untouched") {
    // the events store carries real dead history
    val p = Compaction.historyProfile(spark, original).head()
    val (total, live, dead, ratio) = (p.getLong(0), p.getLong(1), p.getLong(2),
      p.getDouble(3))
    assert(total == live + dead && dead > 0)
    assert(math.abs(ratio - dead.toDouble / live) < 1e-12)
    // below-threshold: the ORIGINAL instance comes back, no rewrite
    val (same, ran) = Compaction.compactIfNeeded(spark, original,
      maxDeadRatio = ratio + 1)
    assert(!ran && (same eq original))
    // above-threshold: compaction runs, head state survives exactly
    val (rewritten, ran2) = Compaction.compactIfNeeded(spark, original,
      maxDeadRatio = ratio / 2)
    assert(ran2 && rewritten.preDeduped)
    def headFacts(st: graft.log.FactStore) =
      new Snapshot(st).currentFacts.collect().map(_.toSeq).toSet
    assert(headFacts(rewritten) == headFacts(original))
    // an already-compacted store profiles as 0 dead → never recompacted
    val p2 = Compaction.historyProfile(spark, compacted).head()
    assert(p2.getLong(2) == 0L && p2.getDouble(3) == 0d)
    assert(!Compaction.compactIfNeeded(spark, compacted)._2)
  }

  test("a NON-compacted store round-trips as preDeduped=false") {
    val root = java.nio.file.Files.createTempDirectory("graft_raw_rt").toString
    val bulk = new graft.log.BulkFactStore(spark, original.factsDF,
      original.touchesDF, original.txsDF)
    bulk.save(root)
    assert(!graft.log.FactLog.open(spark, root).preDeduped,
      "a store with live history must NOT reopen preDeduped")
  }
}
