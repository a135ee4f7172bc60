package graft

import graft.operators.{IccProfiles, Jp2Decoder, Jp2Encoder, Jp2Params}

/** Smoke for the round-14 9/7 irreversible path + ICC colr. */
object Jp2Debug {
  private def psnr(a: Array[Int], b: Array[Int], maxV: Int): Double = {
    var se = 0.0
    var i = 0
    while (i < a.length) { val d = a(i) - b(i); se += d.toDouble * d; i += 1 }
    if (se == 0) Double.PositiveInfinity
    else 10.0 * math.log10(maxV.toDouble * maxV * a.length / se)
  }

  def main(args: Array[String]): Unit = {
    // smooth-ish synthetic: gradients + sinusoids (transform-codable)
    val w = 301; val h = 217
    def img(phase: Double): Array[Int] = Array.tabulate(w * h) { i =>
      val x = i % w; val y = i / w
      val v = 128 + 60 * math.sin(x / 17.0 + phase) * math.cos(y / 23.0) +
        40.0 * x / w - 30.0 * y / h
      math.max(0, math.min(255, v.toInt))
    }
    val comps = Seq(img(0), img(1), img(2))
    val p = Jp2Params(levels = 4, irreversible = true,
      icc = Some(IccProfiles.sRGB))
    val bytes = Jp2Encoder.encode(comps, w, h, bits = 8, params = p)
    println(s"encoded ${bytes.length} bytes (raw ${3 * w * h})")
    // layer monotonicity
    var prev = -1.0
    for (l <- 1 to p.layers) {
      val dec = Jp2Decoder.decode(bytes, maxLayers = l)
      val ps = (0 until 3).map(c => psnr(dec.comps(c), comps(c), 255)).min
      println(f"maxLayers=$l: min-comp PSNR $ps%.2f dB ${if (ps >= prev - 0.01) "" else "<< NON-MONOTONE"}")
      prev = ps
    }
    // finer baseStep => better PSNR
    for (bs <- Seq(1.0, 1.0 / 64, 1.0 / 512, 1.0 / 2048)) {
      val b2 = Jp2Encoder.encode(comps, w, h, bits = 8,
        params = Jp2Params(levels = 4, layers = 1, rates = Seq(48.0),
          irreversible = true, baseStep = bs))
      val dec = Jp2Decoder.decode(b2)
      val ps = (0 until 3).map(c => psnr(dec.comps(c), comps(c), 255)).min
      println(f"baseStep=$bs%.5f: PSNR $ps%.2f dB, ${b2.length} bytes")
    }
    // gray path
    val bg = Jp2Encoder.encode(Seq(comps(0)), w, h, bits = 8,
      params = Jp2Params(levels = 3, layers = 1, rates = Seq(48.0),
        irreversible = true, icc = Some(IccProfiles.gray22)))
    val dg = Jp2Decoder.decode(bg)
    println(f"gray irreversible PSNR ${psnr(dg.comps(0), comps(0), 255)}%.2f dB")
    // ICC validity via the JDK's parser
    for ((nm, prof) <- Seq("sRGB" -> IccProfiles.sRGB, "gray22" -> IccProfiles.gray22)) {
      val icc = java.awt.color.ICC_Profile.getInstance(prof)
      println(s"ICC $nm: ${prof.length} bytes, numComponents=${icc.getNumComponents}, class=${icc.getProfileClass}")
    }
  }
}
