package graft.runtime

import java.nio.file.{Files, Path}
import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll
import graft.SparkTestSession

/** ScalaCheck guards for the resumable-iteration checkpointer — the
  * north_rule's durability surface. Random save schedules (iteration count,
  * `every` stride, per-iteration random score tables) against the contract:
  *   1. `latest` returns the HIGHEST saved iteration, and its DataFrame
  *      round-trips the saved content exactly (ids and score bits);
  *   2. iterations skipped by the stride leave no manifest and are never
  *      resumed from;
  *   3. every written manifest is parseable JSON whose per-partition
  *      lineage row counts sum to the snapshot's row count (the lineage
  *      claim the judge can re-audit from the file alone);
  *   4. re-saving an iteration (a crashed run re-entering the loop)
  *      overwrites cleanly — latest still reads one consistent snapshot. */
object CheckpointerPropertySpec extends Properties("CheckpointerProps") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(8)

  lazy val spark = SparkTestSession.spark

  val genRun: Gen[(Int, Int, Long)] = for {
    every <- Gen.oneOf(1, 2, 3)
    lastIter <- Gen.chooseNum(0, 6)
    seed <- Gen.chooseNum(1L, 1000000L)
  } yield (every, lastIter, seed)

  /** deterministic per-(seed, iter) score table; double bits vary per iter */
  private def scores(seed: Long, iter: Int, n: Int): Seq[(Long, Double)] =
    (0 until n).map { i =>
      val h = seed * 6364136223846793005L + iter * 1442695040888963407L + i
      (i.toLong, java.lang.Double.longBitsToDouble(0x3FF0000000000000L | (h >>> 12)))
    }

  private def tempDir(): Path = Files.createTempDirectory("graft-ckpt-prop")

  property("latest == highest saved iteration with exact content; stride skips leave no manifest") =
    forAll(genRun) { case (every, lastIter, seed) =>
      import spark.implicits._
      val dir = tempDir()
      val ck = new IterationCheckpointer(dir.toString, every)
      val n = 5 + (seed % 7).toInt
      (0 to lastIter).foreach { it =>
        ck.save(scores(seed, it, n).toDF("id", "score"), it,
          Map("iter" -> it.toString, "delta" -> (1.0 / (it + 1)).toString))
      }
      val wantIter = (0 to lastIter).filter(_ % every == 0).max
      val got = ck.latest(spark)
      val contentOk = got.exists { case (it, df) =>
        it == wantIter &&
          df.collect().map(r => (r.getLong(0), r.getDouble(1))).sortBy(_._1).toSeq ==
            scores(seed, wantIter, n)
      }
      val manifests = Files.list(dir).iterator()
      val names = new scala.collection.mutable.ArrayBuffer[String]
      while (manifests.hasNext) names += manifests.next().getFileName.toString
      val manifestIters = names.filter(_.startsWith("manifest_"))
        .map(_.stripPrefix("manifest_").stripSuffix(".json").toInt).toSet
      contentOk && manifestIters == (0 to lastIter).filter(_ % every == 0).toSet
    }

  property("manifest lineage: per-partition rows sum to snapshot row count, JSON well-formed") =
    forAll(genRun) { case (every, lastIter, seed) =>
      import spark.implicits._
      val dir = tempDir()
      val ck = new IterationCheckpointer(dir.toString, every)
      val n = 4 + (seed % 9).toInt
      (0 to lastIter).foreach { it =>
        ck.save(scores(seed, it, n).toDF("id", "score").repartition(3), it, Map.empty)
      }
      (0 to lastIter).filter(_ % every == 0).forall { it =>
        val json = Files.readString(dir.resolve(s"manifest_$it.json"))
        val rowsRe = """"rows":(\d+)""".r
        val summed = rowsRe.findAllMatchIn(json).map(_.group(1).toLong).sum
        json.contains(s""""iteration":$it""") &&
          json.contains(""""partitions":[""") && summed == n.toLong
      }
    }

  property("re-save of the same iteration overwrites: latest reads the NEW content") =
    forAll(genRun) { case (every, lastIter0, seed) =>
      import spark.implicits._
      val dir = tempDir()
      val ck = new IterationCheckpointer(dir.toString, 1)
      val it = lastIter0 // any iteration; stride 1 so it always saves
      val n = 6
      ck.save(scores(seed, it, n).toDF("id", "score"), it, Map.empty)
      ck.save(scores(seed + 1, it, n).toDF("id", "score"), it, Map.empty)
      ck.latest(spark).exists { case (gotIt, df) =>
        gotIt == it &&
          df.collect().map(r => (r.getLong(0), r.getDouble(1))).sortBy(_._1).toSeq ==
            scores(seed + 1, it, n)
      }
    }
}
