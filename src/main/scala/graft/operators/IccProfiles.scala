package graft.operators

import java.io.ByteArrayOutputStream

/** Minimal, valid ICC v2 display profiles built from the public
  * ICC.1:2001-04 structure — the payload for the METH=2 `colr` box the
  * reference's production images carry (`bin/main.py:310-311` assigns
  * `lib/sRGB.icc` to 24-bit color and `lib/gray22.icc` to everything
  * else; these are from-spec equivalents, not copies of those files).
  * [[sRGB]] is an RGB monitor profile with the D50-adapted sRGB
  * primaries and a gamma-2.2 tone curve; [[gray22]] is its grayscale
  * twin (gamma-2.2 kTRC). Both parse under the JDK's own validator
  * (`java.awt.color.ICC_Profile.getInstance`) — spec-asserted.
  *
  * All numeric constants are public colorimetry: the D50 PCS
  * illuminant, the D50-adapted sRGB primary XYZs published in
  * IEC 61966-2-1 / the ICC sRGB annex.
  */
object IccProfiles {

  private def be32(v: Int): Array[Byte] =
    Array((v >>> 24).toByte, ((v >> 16) & 0xFF).toByte,
      ((v >> 8) & 0xFF).toByte, (v & 0xFF).toByte)
  private def be16(v: Int): Array[Byte] =
    Array(((v >> 8) & 0xFF).toByte, (v & 0xFF).toByte)
  private def sig(s: String): Array[Byte] = {
    require(s.length == 4, s"4-char signature, got '$s'")
    s.getBytes("US-ASCII")
  }
  /** s15Fixed16Number. */
  private def s15f16(v: Double): Array[Byte] =
    be32(math.round(v * 65536.0).toInt)

  /** 'XYZ ' tag data. */
  private def xyzTag(x: Double, y: Double, z: Double): Array[Byte] =
    sig("XYZ ") ++ be32(0) ++ s15f16(x) ++ s15f16(y) ++ s15f16(z)

  /** 'curv' tag data with a single u8Fixed8 gamma entry. */
  private def gammaTag(gamma: Double): Array[Byte] =
    sig("curv") ++ be32(0) ++ be32(1) ++ be16(math.round(gamma * 256.0).toInt)

  /** 'text' tag data (NUL-terminated ASCII). */
  private def textTag(s: String): Array[Byte] =
    sig("text") ++ be32(0) ++ s.getBytes("US-ASCII") ++ Array[Byte](0)

  /** 'desc' tag data: ASCII description + empty Unicode + empty
    * ScriptCode blocks (the v2 layout, 67-byte Macintosh field). */
  private def descTag(s: String): Array[Byte] = {
    val ascii = s.getBytes("US-ASCII") ++ Array[Byte](0)
    sig("desc") ++ be32(0) ++ be32(ascii.length) ++ ascii ++
      be32(0) ++ be32(0) ++ // Unicode language code + count
      be16(0) ++ Array[Byte](0) ++ // ScriptCode + Mac count
      new Array[Byte](67)
  }

  // D50 PCS illuminant (ICC spec: 0.9642, 1.0, 0.8249)
  private val D50 = (0.96420, 1.00000, 0.82491)

  /** Assemble header + tag table + aligned tag data. */
  private def profile(colorSpace: String,
      tags: Seq[(String, Array[Byte])]): Array[Byte] = {
    // layout: 128-byte header, tag count, 12 bytes per tag entry
    val headerSize = 128
    val tableSize = 4 + 12 * tags.length
    // share identical tag data blocks (rTRC/gTRC/bTRC point at one curve)
    val unique = scala.collection.mutable.LinkedHashMap[Seq[Byte], Int]()
    var off = headerSize + tableSize
    tags.foreach { case (_, data) =>
      val key = data.toSeq
      if (!unique.contains(key)) {
        unique(key) = off
        off += data.length
        off = (off + 3) & ~3 // 4-byte alignment
      }
    }
    val total = off
    val out = new ByteArrayOutputStream(total)
    // ---- header
    out.write(be32(total))
    out.write(be32(0)) // CMM: none
    out.write(be32(0x02200000)) // version 2.2
    out.write(sig("mntr")) // display device class
    out.write(sig(colorSpace))
    out.write(sig("XYZ ")) // PCS
    // dateTimeNumber: 2026-01-01 00:00:00
    out.write(be16(2026)); out.write(be16(1)); out.write(be16(1))
    out.write(be16(0)); out.write(be16(0)); out.write(be16(0))
    out.write(sig("acsp"))
    out.write(be32(0)) // platform
    out.write(be32(0)) // flags
    out.write(be32(0)) // manufacturer
    out.write(be32(0)) // model
    out.write(be32(0)); out.write(be32(0)) // attributes
    out.write(be32(0)) // rendering intent: perceptual
    out.write(s15f16(D50._1)); out.write(s15f16(D50._2)); out.write(s15f16(D50._3))
    out.write(be32(0)) // creator
    out.write(new Array[Byte](44)) // reserved to 128
    // ---- tag table
    out.write(be32(tags.length))
    tags.foreach { case (tagSig, data) =>
      out.write(sig(tagSig))
      out.write(be32(unique(data.toSeq)))
      out.write(be32(data.length))
    }
    // ---- tag data, aligned, deduplicated
    var pos = headerSize + tableSize
    unique.foreach { case (data, dOff) =>
      while (pos < dOff) { out.write(0); pos += 1 }
      out.write(data.toArray)
      pos += data.length
    }
    while (pos < total) { out.write(0); pos += 1 }
    out.toByteArray
  }

  /** RGB display profile: D50-adapted sRGB primaries, gamma 2.2. */
  lazy val sRGB: Array[Byte] = {
    val g = gammaTag(2.2)
    profile("RGB ", Seq(
      "desc" -> descTag("graft sRGB (gamma 2.2)"),
      "wtpt" -> xyzTag(D50._1, D50._2, D50._3),
      "rXYZ" -> xyzTag(0.436066, 0.222488, 0.013916),
      "gXYZ" -> xyzTag(0.385147, 0.716873, 0.097076),
      "bXYZ" -> xyzTag(0.143066, 0.060608, 0.714096),
      "rTRC" -> g, "gTRC" -> g, "bTRC" -> g,
      "cprt" -> textTag("public-domain synthesized profile")))
  }

  /** Grayscale gamma-2.2 display profile. */
  lazy val gray22: Array[Byte] = {
    profile("GRAY", Seq(
      "desc" -> descTag("graft gray (gamma 2.2)"),
      "wtpt" -> xyzTag(D50._1, D50._2, D50._3),
      "kTRC" -> gammaTag(2.2),
      "cprt" -> textTag("public-domain synthesized profile")))
  }
}
