package graft.tools

import graft.ScalingBench

/** Standalone runner for the exact 3-level scaling protocol Bench records
  * per round (levels 2/8/32, warm-up + interleaved trials, per-level min) —
  * used to validate the gate before a driver-recorded Bench run.
  * Usage: ScalingRun [nPages] [iters] [trials] [warmup]
  */
object ScalingRun {
  def main(args: Array[String]): Unit = {
    val nPages = if (args.length > 0) args(0).toLong else 10000000L
    val iters = if (args.length > 1) args(1).toInt else 2
    val trials = if (args.length > 2) args(2).toInt else 4
    val warmup = if (args.length > 3) args(3).toInt else 1
    val adjPath = ScalingBench.ensureAdjacency(nPages)
    val t0 = System.nanoTime()
    val levels = ScalingBench.measureLevels(adjPath, nPages, Seq(2, 8, 32),
      iters, trials, warmup)
    val nE = ScalingBench.lastEdges
    def pair(lo: Int, hi: Int) = ScalingBench.PairResult(
      nPages, nE, iters, lo, hi, levels(lo), levels(hi),
      ScalingBench.loadLog.getOrElse(lo, Vector.empty),
      ScalingBench.loadLog.getOrElse(hi, Vector.empty),
      ScalingBench.probeLog.getOrElse(lo, Vector.empty),
      ScalingBench.probeLog.getOrElse(hi, Vector.empty)).json
    println(s"[${pair(2, 8)},${pair(8, 32)}]")
    println(f"wall_sec: ${(System.nanoTime() - t0) / 1e9}%.1f")
  }
}
