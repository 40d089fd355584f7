package graft.runtime

import java.nio.file.{Files, Paths, StandardOpenOption}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener

/** Execution recorder — the Spark analogue of the reference's `Recorder`
  * (`graphblas/core/recorder.py:34-100`), which logs every backend call as
  * C text. Here: a QueryExecutionListener appending one line per executed
  * query (name, wall ns, physical plan digest) to a log file — plan-level
  * regression/lineage evidence for iterative runs.
  */
final class PlanRecorder(path: String) extends QueryExecutionListener {
  Files.createDirectories(Paths.get(path).getParent)

  private def record(funcName: String, qe: QueryExecution, extra: String): Unit = {
    val plan = qe.executedPlan.toString.linesIterator.take(40).mkString("\n  ")
    val line = s"== $funcName $extra\n  $plan\n"
    Files.writeString(Paths.get(path), line,
      StandardOpenOption.CREATE, StandardOpenOption.APPEND)
  }

  override def onSuccess(funcName: String, qe: QueryExecution, durationNs: Long): Unit =
    record(funcName, qe, s"ok ${durationNs / 1000000}ms")

  override def onFailure(funcName: String, qe: QueryExecution, ex: Exception): Unit =
    record(funcName, qe, s"FAILED ${ex.getClass.getSimpleName}")
}

object PlanRecorder {
  /** Attach a recorder to the session; returns it (detach via
    * `spark.listenerManager.unregister`). */
  def attach(spark: SparkSession, path: String): PlanRecorder = {
    val r = new PlanRecorder(path)
    spark.listenerManager.register(r)
    r
  }
}
