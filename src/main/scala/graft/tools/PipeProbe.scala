package graft.tools

import graft.{Bench, Sessions}
import graft.ext.Pipe

/** Timing probe for the composed corpus pipeline's gate-barrier
  * decision (r19): with the lambda-chain gate, predicate pushdown
  * through the gate projection was O(tokens²) and the entry needed a
  * localCheckpoint barrier (22.9 s vs 1.3 s at sf0.1 — PLANS r18 §8).
  * After the codegen `token_stats` rewrite the hazard's root is gone;
  * this main measures both shapes on identical code so the registered
  * entry's barrier-off choice is a recorded measurement, not a guess.
  *
  * Usage: runMain graft.tools.PipeProbe [sfDir]
  */
object PipeProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = Sessions.local(cores = 32, appName = "graft-pipe-probe")
    spark.sparkContext.setLogLevel("WARN")
    def timed(label: String, barrier: Boolean): Unit = {
      // warm-up rep + 2 timed reps, min (the bench discipline)
      val secs = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        val n = Pipe.pipeBuild(spark, sfDir, gateBarrier = barrier).collect().length
        val s = (System.nanoTime() - t0) / 1e9
        Bench.isolate(spark)
        (s, n)
      }
      val n = secs.head._2
      println(f"""{"probe":"pipe_gate_barrier","shape":"$label","rows":$n,"min_sec":${secs.drop(1).map(_._1).min}%.2f}""")
    }
    timed("barrier", barrier = true)
    timed("no_barrier", barrier = false)
    spark.stop()
  }
}
