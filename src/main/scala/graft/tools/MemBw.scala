package graft.tools

/** Sandbox memory-bandwidth probe (BENCH.md methodology evidence).
  *
  * The bench's CPU probe (graft.Bench HostProbe) is ALU-bound and shows
  * the host's per-core compute supply; this tool measures the OTHER
  * shared resource — memory bandwidth — by timing large-buffer copies
  * (System.arraycopy, the same memcpy path tmpfs shuffle/output writes
  * take) at increasing thread counts. On a virtualized single box the
  * aggregate GB/s plateaus well before the vCPU count, which is why the
  * end-to-end job (kernel + tmpfs shuffle + tmpfs write ≈ 3× the kernel's
  * RAM traffic) scales sublinearly at high thread counts even when the
  * CPU-bound kernel scales ~linearly. A real cluster adds memory
  * channels and NICs with every executor, so this ceiling is a sandbox
  * artifact, not an engine property.
  *
  *   sbt -batch "runMain graft.tools.MemBw"   # prints GB/s at 1,2,4,8,16 threads
  */
object MemBw {
  private val BufBytes = 64 << 20 // 64 MB per thread, far beyond LLC
  private val Reps = 6

  private def copySecs(threads: Int): Double = {
    val bufs = Array.fill(threads)(
      (new Array[Byte](BufBytes), new Array[Byte](BufBytes)))
    val start = new java.util.concurrent.CountDownLatch(1)
    val done = new java.util.concurrent.CountDownLatch(threads)
    val ts = bufs.map { case (src, dst) =>
      val t = new Thread(() => {
        start.await()
        var r = 0
        while (r < Reps) { System.arraycopy(src, 0, dst, 0, BufBytes); r += 1 }
        done.countDown()
      })
      t.start(); t
    }
    val t0 = System.nanoTime()
    start.countDown()
    done.await()
    val secs = (System.nanoTime() - t0) / 1e9
    ts.foreach(_.join())
    secs
  }

  def main(args: Array[String]): Unit = {
    // Warmup (JIT + page faults on fresh arrays).
    copySecs(2)
    Seq(1, 2, 4, 8, 16).foreach { n =>
      val secs = Seq.fill(3)(copySecs(n)).min
      // 2 bytes moved per copied byte (read + write).
      val gbps = n.toDouble * Reps * BufBytes * 2 / secs / 1e9
      println(f"threads=$n%2d aggregate ${gbps}%.1f GB/s (per-thread ${gbps / n}%.1f)")
    }
  }
}
