package graft

import graft.operators.{Jp2Codec, Jp2Decoder, Jp2Encoder, Jp2Params}

import scala.util.Random

/** SIGSEGV repro harness for the round-13 `hs_err_pid5198.log` crash
  * (C2-compiled `Jp2Codec$Dwt53$.inverse` under the driver's
  * `-XX:PerMethodRecompilationCutoff=-1` flags). Hammers the exact code
  * path that crashed — `Jp2Decoder.decode` → `inverseDwt` → `Dwt53.inverse`
  * — with geometry-varied round-trips so the kernel's loop-trip profiles
  * keep churning and C2 keeps recompiling (the cutoff is disabled, so
  * recompilation is unbounded — the suspected trigger).
  *
  * Run under the forked driver flags (`sbt "runMain graft.Jp2Stress 480"`);
  * arg = seconds to run. Exits 0 if no crash and every round-trip is
  * lossless; a JVM-level repro leaves an hs_err log. Verdict recorded in
  * BENCH_NOTES.md ("round 14: Dwt53 SIGSEGV adjudication").
  */
object Jp2Stress {
  def main(args: Array[String]): Unit = {
    val seconds = if (args.nonEmpty) args(0).toInt else 480
    val deadline = System.nanoTime() + seconds * 1000L * 1000 * 1000
    val rnd = new Random(14)
    var iters = 0L
    var direct = 0L
    while (System.nanoTime() < deadline) {
      // 1) Direct kernel churn: varied odd/even lengths pollute the
      //    branch/loop profiles of forward+inverse every iteration.
      var k = 0
      while (k < 200) {
        val n = 1 + rnd.nextInt(300)
        val x = Array.fill(n)(rnd.nextInt(65536) - 32768)
        val (lo, hi) = Jp2Codec.Dwt53.forward(x, n)
        val back = Jp2Codec.Dwt53.inverse(lo, hi)
        if (!java.util.Arrays.equals(x, back))
          sys.error(s"Dwt53 1-D round-trip mismatch at n=$n")
        k += 1; direct += 1
      }
      // 2) Full-path churn: the exact crash stack (decode → inverseDwt →
      //    Dwt53.inverse), geometry randomized per iteration.
      val w = 17 + rnd.nextInt(180)
      val h = 17 + rnd.nextInt(180)
      val levels = 1 + rnd.nextInt(5)
      val nc = if (rnd.nextBoolean()) 1 else 3
      val comps = Seq.fill(nc)(Array.fill(w * h)(rnd.nextInt(256)))
      val p = Jp2Params(tileSize = 64, precinct = 256, levels = levels,
        layers = 1, rates = Seq(32.0), lossless = true)
      val bytes = Jp2Encoder.encode(comps, w, h, bits = 8, params = p)
      val dec = Jp2Decoder.decode(bytes)
      var c = 0
      while (c < nc) {
        if (!java.util.Arrays.equals(dec.comps(c), comps(c)))
          sys.error(s"lossless round-trip mismatch ${w}x$h L$levels c$c")
        c += 1
      }
      iters += 1
      if (iters % 50 == 0)
        println(s"[jp2stress] $iters round-trips, $direct direct 1-D, " +
          f"${(deadline - System.nanoTime()) / 1e9}%.0f s left")
    }
    println(s"[jp2stress] CLEAN: $iters round-trips + $direct direct 1-D " +
      s"kernel calls in $seconds s, zero crashes, zero mismatches")
  }
}
