package graft

import graft.gen.TranscriptGen
import graft.pipe.ExtractPipeline
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Memory-pressure evidence for the order-restore sort (round-3 verdict,
  * Missing #4): at 100 TB the per-partition (conv_id, turn_idx) sort WILL
  * spill to disk; this suite proves the spill path is exercised and that
  * output equality survives it. A constrained context forces
  * UnsafeExternalSorter to spill every 512 rows
  * (`spark.shuffle.spill.numElementsForceSpillThreshold` — the knob Spark's
  * own sorter suites use, deterministic where a tiny heap is flaky), a
  * listener sums the spill task metrics, and the result is compared
  * per-turn against the spec-derived goldens.
  *
  * The dedicated context also exercises the self-healing shared session:
  * this suite STOPS the shared context; later suites must transparently get
  * a rebuilt one (SparkTestBase.session re-creates on isStopped).
  */
class SpillSpec extends AnyFunSuite with SparkTestBase {

  test("order-restore sort spills under forced memory pressure and stays exact") {
    // corpus large enough that every sort partition crosses the 512-row
    // threshold repeatedly
    val (seed, nConvs, hotBase) = (42L, 400, 2000)

    // stop the shared session: the force-spill threshold is a CORE conf,
    // fixed at context creation
    SparkTestBase.session().stop()
    val constrained = SparkSession.builder()
      .master("local[4]")
      .appName("graft-spill-test")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.shuffle.spill.numElementsForceSpillThreshold", "512")
      .getOrCreate()
    try {
      var memSpilled = 0L
      var diskSpilled = 0L
      val listener = new SparkListener {
        override def onTaskEnd(te: SparkListenerTaskEnd): Unit =
          Option(te.taskMetrics).foreach { m =>
            memSpilled += m.memoryBytesSpilled
            diskSpilled += m.diskBytesSpilled
          }
      }
      constrained.sparkContext.addSparkListener(listener)
      val out = ExtractPipeline.run(constrained,
          TranscriptGen.dataset(constrained, seed, nConvs, hotBase, partitions = 6))
        .collect()
      // listener events are delivered asynchronously — bounded wait
      var waited = 0
      while (memSpilled + diskSpilled == 0L && waited < 10000) {
        Thread.sleep(200); waited += 200
      }
      constrained.sparkContext.removeSparkListener(listener)

      assert(diskSpilled > 0L || memSpilled > 0L,
        s"no spill recorded (mem=$memSpilled disk=$diskSpilled) — threshold not in effect")
      info(s"spilled: memoryBytesSpilled=$memSpilled diskBytesSpilled=$diskSpilled")

      // exactness under spill: per-turn text equality vs goldens, full count
      val expected = TranscriptGen.corpus(seed, nConvs, hotBase)
        .map(g => (g.turn.conv_id, g.turn.turn_idx) -> g.expText).toMap
      assert(out.length == expected.size)
      out.foreach(e => assert(e.text == expected((e.conv_id, e.turn_idx)),
        s"text @ ${e.conv_id}/${e.turn_idx}"))
    } finally constrained.stop()

    // self-healing: the next shared-session access must rebuild transparently
    val healed = spark
    assert(!healed.sparkContext.isStopped)
    import testImplicits._
    assert(Seq(1, 2, 3).toDS().count() == 3L)
  }
}
