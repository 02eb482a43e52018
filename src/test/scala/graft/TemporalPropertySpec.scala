package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.graph.GraftGraph
import graft.model.{A, PropType}
import graft.snapshot.Snapshot

/** Property-based temporal invariants (SURVEY §5 plan): a random mutation
  * sequence, replayed against a trivial in-memory model, must agree with
  * (a) every asOf view of the driver API and (b) the Spark Snapshot path —
  * for EVERY transaction in the history. */
class TemporalPropertySpec extends AnyFunSuite {

  sealed trait Op
  case class SetProp(v: Int, key: String, value: Long) extends Op
  case class RemoveProp(v: Int, key: String) extends Op
  case class AddEdge(a: Int, b: Int) extends Op
  case class RemoveVertexOp(v: Int) extends Op

  private val genOp: Gen[Op] = Gen.frequency(
    6 -> (for { v <- Gen.choose(0, 3); k <- Gen.oneOf("p", "q"); x <- Gen.choose(0L, 9L) }
      yield SetProp(v, k, x)),
    2 -> (for { v <- Gen.choose(0, 3); k <- Gen.oneOf("p", "q") } yield RemoveProp(v, k)),
    2 -> (for { a <- Gen.choose(0, 3); b <- Gen.choose(0, 3) } yield AddEdge(a, b)),
    1 -> Gen.choose(0, 3).map(RemoveVertexOp))

  // model state: per vertex-slot → (alive, props); edges: (id, a, b) alive
  case class MState(alive: Map[Int, Boolean], props: Map[Int, Map[String, Long]],
                    edges: Set[(Int, Int, Int)])

  test("random mutation sequences: every asOf reconstructs the model, on both read paths") {
    // deterministic seeds instead of the scalatest-scalacheck bridge
    // (not on the offline classpath)
    val runs = (1 to 8).map(i =>
      Gen.listOfN(20, genOp)(Gen.Parameters.default, Seed(i.toLong))
        .getOrElse(Nil))
    runs.foreach { ops =>
      val g = new GraftGraph(TestSpark.spark)
      val vs = (0 to 3).map(_ => g.addVertex())
      var edgeSeq = 0
      var st = MState((0 to 3).map(_ -> true).toMap,
        (0 to 3).map(_ -> Map.empty[String, Long]).toMap, Set.empty)
      // expected state AFTER each committed tx
      val timeline = scala.collection.mutable.ArrayBuffer.empty[(Long, MState)]
      timeline += ((g.log.headTx, st))

      ops.foreach {
        case SetProp(v, k, x) if st.alive(v) =>
          vs(v).setProperty(k, x)
          st = st.copy(props = st.props.updated(v, st.props(v).updated(k, x)))
          timeline += ((g.log.headTx, st))
        case RemoveProp(v, k) if st.alive(v) =>
          vs(v).removeProperty(k)
          st = st.copy(props = st.props.updated(v, st.props(v) - k))
          timeline += ((g.log.headTx, st))
        case AddEdge(a, b) if st.alive(a) && st.alive(b) =>
          g.addEdge(vs(a), vs(b), "e")
          edgeSeq += 1
          st = st.copy(edges = st.edges + ((edgeSeq, a, b)))
          timeline += ((g.log.headTx, st))
        case RemoveVertexOp(v) if st.alive(v) =>
          g.removeVertex(vs(v))
          st = MState(st.alive.updated(v, false),
            st.props.updated(v, Map.empty),
            st.edges.filterNot(e => e._2 == v || e._3 == v))
          timeline += ((g.log.headTx, st))
        case _ => // op on a dead vertex: no-op
      }

      // (a) driver API: every tx point reconstructs
      timeline.foreach { case (tx, exp) =>
        val view = g.asOfTx(tx)
        (0 to 3).foreach { i =>
          val h = view.vertex(vs(i).id)
          assert((h != null) == exp.alive(i), s"alive mismatch v$i at tx $tx")
          if (h != null) {
            Seq("p", "q").foreach { k =>
              assert(Option(h.getProperty(k)) == exp.props(i).get(k),
                s"prop $k of v$i at tx $tx")
            }
          }
        }
        assert(view.edges.size == exp.edges.size, s"edge count at tx $tx")
      }

      // (b') fused same-store difference agrees with the model at sampled
      // pin pairs (both directions): a live (e, key, x) at t1 is in the
      // diff iff t2's live view lacks that exact value
      {
        val txsAll = timeline.map(_._1).distinct.sorted
        val pairs = Seq(
          (txsAll.last, txsAll.head), (txsAll.head, txsAll.last),
          (txsAll(txsAll.size / 2), txsAll.last)).distinct
        def liveProps(st: MState, i: Int): Map[String, Long] =
          if (st.alive(i)) st.props(i) else Map.empty
        pairs.foreach { case (t1, t2) =>
          val s1 = timeline.reverse.find(_._1 <= t1).get._2
          val s2 = timeline.reverse.find(_._1 <= t2).get._2
          val expected = (0 to 3).flatMap { i =>
            liveProps(s1, i).collect {
              case (k, x) if !liveProps(s2, i).get(k).contains(x) => (vs(i).id, k, x)
            }
          }.toSet
          val got = new Snapshot(g.log, t1)
            .differenceFacts(new Snapshot(g.log, t2))
            .where(org.apache.spark.sql.functions.col("attr")
              .isin("p.long.vertex", "q.long.vertex"))
            .collect()
            .map(r => (r.getAs[Long]("e"),
              r.getAs[String]("attr").takeWhile(_ != '.'),
              r.getAs[Long]("vLong"))).toSet
          assert(got == expected, s"fused diff t1=$t1 t2=$t2")
        }
      }

      // (b) Spark Snapshot path at three sampled txs
      val samples = timeline.map(_._1).distinct.sorted
      val picks = Seq(samples.head, samples(samples.size / 2), samples.last).distinct
      picks.foreach { tx =>
        val exp = timeline.reverse.find(_._1 <= tx).get._2
        val snap = new Snapshot(g.log, tx)
        val liveIds = snap.vertexIds.collect().map(_.getLong(0)).toSet
        assert(liveIds == (0 to 3).filter(exp.alive).map(vs(_).id).toSet, s"spark vertices at tx $tx")
        val pVals = snap.prop("p", PropType.PLong, A.Vertex).collect()
          .map(r => r.getAs[Long]("e") -> r.getAs[Long]("v")).toMap
        val expP = (0 to 3).flatMap(i => exp.props(i).get("p").map(vs(i).id -> _)).toMap
        assert(pVals == expP, s"spark p values at tx $tx")
        assert(snap.edges.count() == exp.edges.size, s"spark edges at tx $tx")
      }
    }
  }
}
