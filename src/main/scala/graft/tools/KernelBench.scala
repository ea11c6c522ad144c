package graft.tools

import graft.gen.TranscriptGen
import graft.kernel.{Extractor, ExtractorContext}
import graft.model.ExtractConfig
import java.util.concurrent.{Executors, TimeUnit}

/** Pure-kernel micro-benchmark (no Spark): extraction throughput of the
  * kernels alone, single-threaded and multi-threaded. Establishes that the
  * Spark job's per-turn cost is dominated by I/O + shuffle + encode, not by
  * the kernels — i.e. distributed overheads are where tuning belongs. */
object KernelBench {
  def main(args: Array[String]): Unit = {
    val nConvs = 40000
    val hotBase = 4000
    val cfg = ExtractConfig.default
    val turns = TranscriptGen.corpus(42L, nConvs, hotBase).map(_.turn).toArray
    println(s"corpus: ${turns.length} turns, " +
      s"${turns.map(_.text.length.toLong).sum / (1 << 20)} MiB payload")

    def run1(): Double = {
      val ctx = new ExtractorContext
      val t0 = System.nanoTime()
      var i = 0
      var sink = 0L
      while (i < turns.length) {
        sink += Extractor.extractTurn(turns(i), cfg, ctx).charsEmitted
        i += 1
      }
      val sec = (System.nanoTime() - t0) / 1e9
      if (sink == 42) println("") // keep the loop alive
      sec
    }
    def runN(threads: Int): Double = {
      val pool = Executors.newFixedThreadPool(threads)
      val chunk = (turns.length + threads - 1) / threads
      val t0 = System.nanoTime()
      (0 until threads).foreach { t =>
        pool.execute { () =>
          val ctx = new ExtractorContext
          var i = t * chunk
          val end = math.min(turns.length, i + chunk)
          var sink = 0L
          while (i < end) { sink += Extractor.extractTurn(turns(i), cfg, ctx).charsEmitted; i += 1 }
          if (sink == 42) println("")
        }
      }
      pool.shutdown(); pool.awaitTermination(10, TimeUnit.MINUTES)
      (System.nanoTime() - t0) / 1e9
    }

    run1(); run1() // JIT warm
    val s1 = math.min(run1(), run1())
    val s16 = math.min(runN(16), runN(16))
    val f = (d: Double) => "%.0f".formatLocal(java.util.Locale.US, d)
    println(s"single-thread: ${f(turns.length / s1)} turns/s")
    println(s"16 threads:    ${f(turns.length / s16)} turns/s")
    println(f"per-turn cost: ${s1 / turns.length * 1e6}%.2f µs single-thread")
  }
}
