package graft.tools

import graft.ScalingBench
import graft.graph.Adjacency
import graft.algos.PageRank

/** Dev probe for the scaling gate: separates the PageRank run's FIXED cost
  * (state init: maxIter=0 returns right after the initial materialize) from
  * the MARGINAL per-iteration cost ((T(6)−T(2))/4) at each parallelism
  * level — tells whether lost 2→8 efficiency is fixed overhead (amortizable
  * by raising the protocol's iteration count) or per-iteration work that
  * stops scaling (DRAM / shuffle floor). */
object PhaseProbe {
  def main(args: Array[String]): Unit = {
    val nP = if (args.length > 0) args(0).toLong else 10000000L
    val adjPath = ScalingBench.ensureAdjacency(nP)
    val rounds = if (args.length > 1) args(1).toInt else 2
    for (_ <- 1 to rounds; cpus <- Seq(8, 2)) {
      val s = ScalingBench.session(cpus, cpus * 2)
      val adj = Adjacency.fromPacked(s.read.parquet(adjPath), nP, cpus * 2)
      PageRank.run(s, adj, tol = 0.0, maxIter = 1) // warm
      val ts = Seq(0, 2, 6).map { k =>
        val t0 = System.nanoTime()
        PageRank.run(s, adj, tol = 0.0, maxIter = k)
        val sec = (System.nanoTime() - t0) / 1e9
        println(f"[phase] cpus=$cpus iters=$k sec=$sec%.2f")
        sec
      }
      println(f"[phase] cpus=$cpus init=${ts(0)}%.2f perIter=${(ts(2) - ts(1)) / 4}%.2f")
      s.stop()
    }
  }
}
