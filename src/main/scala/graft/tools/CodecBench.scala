package graft.tools

import graft.ops.Multimodal

/** Microbench of the PNG codec kernel (no Spark): times the
  * encode→decode→sums path single-threaded and at 32 threads — the
  * shape the mm_* Spark tasks run in. r17 kernel history: the default
  * ImageIO path (disk-backed stream cache, registry scan per call,
  * per-pixel get/setRGB) measured 167–394 us/doc single-thread and
  * ~45–90 us/doc wall at 32 threads; the memory-cached thread-local
  * kernel measures ~67 us/doc single-thread, scaling with threads. */
object CodecBench {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toInt else 2000
    def dims(id: Long): (Int, Int) = ((id % 16 + 8).toInt, (id % 12 + 6).toInt)
    def one(id: Long): Long = {
      val (w, h) = dims(id)
      Multimodal.decodeChannelSums(Multimodal.encodePng(id, w, h))._3
    }
    (0 until 500).foreach(i => one(i.toLong)) // warmup
    var sink = 0L
    for (round <- 1 to 3) {
      val t0 = System.nanoTime()
      var i = 0
      while (i < n) { sink += one(i.toLong); i += 1 }
      val ms = (System.nanoTime() - t0) / 1e6
      println(f"round $round: $n docs in $ms%.1f ms (${ms * 1000 / n}%.1f us/doc)")
    }
    val threads = 32
    for (round <- 1 to 3) {
      val t0 = System.nanoTime()
      val acc = new java.util.concurrent.atomic.AtomicLong()
      val ts = (0 until threads).map { t =>
        new Thread(() => {
          var i = t; var s = 0L
          while (i < n * 8) { s += one(i.toLong); i += threads }
          acc.addAndGet(s)
        })
      }
      ts.foreach(_.start()); ts.foreach(_.join())
      val ms = (System.nanoTime() - t0) / 1e6
      println(f"mt round $round: ${n * 8} docs / $threads threads in $ms%.1f ms (${ms * 1000 / (n * 8)}%.2f us/doc wall) acc=${acc.get()}")
    }
    println(s"sink=$sink")
  }
}
