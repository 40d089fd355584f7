package graft.ingest

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

import graft.SparkTestSession

/** Property guard for IcebergLite v2 merge-on-read: a RANDOM sequence of
  * appends, position deletes (`deleteWhere`) and global equality deletes
  * must read back exactly what a driver-side relational simulation of the
  * spec's visibility rules says — position deletes remove currently
  * visible rows matching the predicate; equality deletes remove rows whose
  * key matches AND whose data sequence number is STRICTLY older; appends
  * after a delete are never affected by it. The same run then TIME-TRAVELS
  * to every committed snapshot — by snapshot-id AND by as-of-timestamp —
  * and each historical read must equal the simulation's state at that op
  * boundary (the spec's snapshot isolation: later deletes/appends are
  * invisible to an earlier snapshot's plan). */
object IcebergPropertySpec extends Properties("IcebergMergeOnRead") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(5)

  lazy val spark = SparkTestSession.spark

  sealed trait Op
  case class Append(batch: Int, n: Int) extends Op
  case class PosDel(m: Int, r: Int) extends Op   // delete where v % m == r
  case class EqDel(m: Int, r: Int) extends Op    // delete keys grp % m == r

  // deterministic row content from the id: v quasi-random, grp in 0..4
  private def rowsOf(batch: Int, n: Int): Seq[(Long, Long, Long)] =
    (0 until n).map { i =>
      val id = batch * 1000L + i
      (id, id % 5, id * 7 % 97)
    }

  val genOp: Gen[Op] = Gen.frequency(
    2 -> (for { m <- Gen.choose(2, 5); r <- Gen.choose(0, 1) } yield PosDel(m, r % m)),
    2 -> (for { m <- Gen.choose(2, 4); r <- Gen.choose(0, 1) } yield EqDel(m, r % m)),
    1 -> Gen.choose(5, 40).map(n => Append(-1, n)) // batch stamped below
  )

  property("random append/pos-delete/eq-delete sequences == driver simulation") =
    forAll(Gen.choose(20, 60), Gen.listOfN(3, genOp)) { (n0, ops0) =>
      val dir = Files.createTempDirectory("graft-iceberg-prop-").toString
      import spark.implicits._
      def df(rows: Seq[(Long, Long, Long)]) = rows.toDF("id", "grp", "v")
      // stamp append batches so ids never collide across appends
      var nextBatch = 1
      val ops = Append(0, n0) +: ops0.map {
        case Append(_, n) => val b = nextBatch; nextBatch += 1; Append(b, n)
        case o => o
      }
      // driver simulation: (id, grp, v, seq); seq = 1-based op index.
      // states(seq) = the visible rows right after op `seq` committed.
      var sim = Vector.empty[(Long, Long, Long, Int)]
      val states = scala.collection.mutable.Map.empty[Int, Vector[(Long, Long, Long)]]
      ops.zipWithIndex.foreach { case (op, i) =>
        val seq = i + 1
        op match {
          case Append(b, n) =>
            IcebergLite.append(df(rowsOf(b, n)), dir, nowMs = 1000L * seq)
            sim ++= rowsOf(b, n).map { case (id, g, v) => (id, g, v, seq) }
          case PosDel(m, r) =>
            IcebergLite.deleteWhere(spark, dir, col("v") % m === r,
              nowMs = 1000L * seq)
            sim = sim.filterNot { case (_, _, v, _) => v % m == r }
          case EqDel(m, r) =>
            IcebergLite.appendEqualityDeletes(spark, dir,
              spark.range(5).select(col("id").as("grp"))
                .filter(col("grp") % m === r),
              nowMs = 1000L * seq)
            // strictly-older rule: every sim row has seq < this op's seq
            sim = sim.filterNot { case (_, g, _, s) => g % m == r && s < seq }
        }
        states(seq) = sim.map { case (id, g, v, _) => (id, g, v) }.sorted
      }
      def read(snapshotId: Option[Long], asOfMs: Option[Long]) =
        IcebergLite.readTable(spark, dir, snapshotId = snapshotId,
            asOfMs = asOfMs).collect()
          .map(row => (row.getLong(0), row.getLong(1), row.getLong(2)))
          .sorted.toVector
      val finalOk = read(None, None) == states(ops.size)
      // time travel: each committed snapshot's ts is 1000·seq (stamped
      // above), so the simulation state at that boundary is states(ts/1000);
      // an op that committed nothing simply has no snapshot to visit.
      val travelOk = IcebergLite.snapshots(spark, dir).forall { case (sid, ts) =>
        val want = states((ts / 1000L).toInt)
        read(Some(sid), None) == want && read(None, Some(ts)) == want
      }
      finalOk && travelOk
    }
}
