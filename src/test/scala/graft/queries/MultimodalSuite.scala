package graft.queries

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** The multimodal ring's ingest-boundary contracts that the driver
  * gates (which decode their own encoder's output) can never hit:
  * corrupt/truncated payload behavior for every decode kernel, and
  * the JPEG gate's error-budget calibration — measured headroom
  * between a faithful lossy decode and the failure modes the budget
  * must catch.
  */
class MultimodalSuite extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private val sfDir = "/root/testdata/sf0.001"

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("multimodal-suite")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def ready: Boolean = new java.io.File(sfDir).isDirectory

  /** A small valid image in `fmt`, built with the JDK encoder —
    * independent of the library's own generators. */
  private def imageBytes(fmt: String): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(8, 6,
      java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    (0 until 6).foreach(y => (0 until 8).foreach(x =>
      img.setRGB(x, y, (x * 40 << 16) | (y * 40 << 8) | 128)))
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, fmt, bos)
    bos.toByteArray
  }

  test("corrupt single-image payloads fail naming the record, " +
      "never as a bare decoder exception") {
    // truncated PNG: container recognized, stream dies mid-decode
    val png = imageBytes("png")
    val truncated = png.take(24)
    val e1 = intercept[IllegalArgumentException] {
      TextOps.decodeImageStrict(42L, truncated)
    }
    assert(e1.getMessage.contains("doc 42") &&
      e1.getMessage.contains(s"${truncated.length} bytes"),
      s"must name the record: ${e1.getMessage}")
    // garbage bytes: no container recognized (ImageIO returns null)
    val e2 = intercept[IllegalArgumentException] {
      TextOps.decodeImageStrict(7L, Array.fill[Byte](64)(0x5A))
    }
    assert(e2.getMessage.contains("doc 7"), e2.getMessage)
    // empty payload
    val e3 = intercept[IllegalArgumentException] {
      TextOps.decodeImageStrict(9L, Array.emptyByteArray)
    }
    assert(e3.getMessage.contains("doc 9"), e3.getMessage)
    // and a VALID payload still decodes through the same path
    val ok = TextOps.decodeImageStrict(1L, png)
    assert(ok.getWidth == 8 && ok.getHeight == 6)
  }

  test("corrupt multi-frame payloads fail naming the record") {
    val reader = javax.imageio.ImageIO
      .getImageReadersByFormatName("tiff").next()
    // a valid single-frame TIFF truncated mid-stream
    val tiff = imageBytes("tiff")
    val e1 = intercept[IllegalArgumentException] {
      TextOps.sampleFramesStrict(reader, 13L, tiff.take(16))
    }
    assert(e1.getMessage.contains("doc 13"), e1.getMessage)
    // garbage bytes through the TIFF page scan
    val e2 = intercept[IllegalArgumentException] {
      TextOps.sampleFramesStrict(reader, 21L, Array.fill[Byte](64)(0x3C))
    }
    assert(e2.getMessage.contains("doc 21"), e2.getMessage)
    // valid payload still samples
    val rows = TextOps.sampleFramesStrict(reader, 2L, tiff)
    assert(rows.map(r => (r._2, r._3)) == Seq((0L, 1L)))
  }

  test("corrupt audio payloads fail naming the record") {
    assume(ready)
    // a valid WAV from the library's own generator, then truncations
    val (id, wav) = TextOps.mmAudioBytes(spark, sfDir).collect()
      .find(_._1 == 3L).get
    // header-only truncation: container recognized, body missing
    val e1 = intercept[IllegalArgumentException] {
      TextOps.decodeAudioStrict(id, wav.take(50))
    }
    assert(e1.getMessage.contains("doc 3"), e1.getMessage)
    // garbage: no container recognized
    val e2 = intercept[IllegalArgumentException] {
      TextOps.decodeAudioStrict(17L, Array.fill[Byte](64)(0x7F))
    }
    assert(e2.getMessage.contains("doc 17"), e2.getMessage)
    // empty
    val e3 = intercept[IllegalArgumentException] {
      TextOps.decodeAudioStrict(19L, Array.emptyByteArray)
    }
    assert(e3.getMessage.contains("doc 19"), e3.getMessage)
    // a valid payload still decodes through the same path, with the
    // decoder-reported shape matching the generator's
    val (fmt, frames, pcm) = TextOps.decodeAudioStrict(id, wav)
    assert(fmt.getChannels == 2 && fmt.getSampleRate == 8000f)
    assert(frames == 120 + (id % 8) * 20)
    assert(pcm.length == frames * 4)
  }

  test("JPEG error budget: faithful decodes pass with headroom; a " +
      "channel swap fails structurally") {
    assume(ready)
    // calibration: the WORST per-doc mean deviation of a faithful
    // decode across the whole corpus must clear the budget with real
    // headroom (a budget a correct decode grazes is no budget)
    val payloads = TextOps.mmJpegBytes(spark, sfDir).collect()
    val errs = payloads
      .map { case (id, bytes) => TextOps.jpegDecodeMeanErrX100(id, bytes) }
    val worst = errs.map(_._4).max
    info(s"faithful-decode mean deviation band: " +
      s"${errs.map(_._4).min / 100.0}–${worst / 100.0} levels " +
      s"(budget ${TextOps.MmJpegMeanTolX100 / 100.0})")
    assert(worst * 16L <= TextOps.MmJpegMeanTolX100 * 10L,
      s"budget must hold >=1.6x headroom over the worst faithful " +
        s"decode: worst=$worst budget=${TextOps.MmJpegMeanTolX100}")
    // and the gate's verdict column agrees end to end
    val all = TextOps.mmDecodeJpeg(spark, sfDir).collect()
    assert(all.nonEmpty && all.forall(_.getLong(4) == 1L),
      "every faithful decode must sit inside the error budget")
    // a channel swap (R<->B): re-digest a faithful decode against the
    // channel-SWAPPED formula — the deviation the gate would see if
    // the kernel had the classic BGR/RGB bug (the gradient formula
    // keeps b − r >= 59 everywhere, so the swap cannot hide) — and
    // assert it lands beyond TWICE the budget
    val (id, bytes) = payloads.find(_._1 == 5L).get
    val img = TextOps.decodeImageStrict(id, bytes)
    var err = 0L
    val (w, h) = (img.getWidth, img.getHeight)
    (0 until h).foreach { y => (0 until w).foreach { x =>
      val got = img.getRGB(x, y)
      val want = { // the lossy ring's formula with R and B exchanged
        val p = TextOps.mmJpegPixel(id, x, y)
        ((p & 0xFF) << 16) | (p & 0xFF00) | ((p >> 16) & 0xFF)
      }
      err += math.abs(((got >> 16) & 0xFF) - ((want >> 16) & 0xFF)) +
        math.abs(((got >> 8) & 0xFF) - ((want >> 8) & 0xFF)) +
        math.abs((got & 0xFF) - (want & 0xFF))
    } }
    val swappedMeanX100 = err * 100L / (3L * w * h)
    assert(swappedMeanX100 > 2L * TextOps.MmJpegMeanTolX100,
      s"channel swap must land far outside the budget: $swappedMeanX100 " +
        s"vs ${TextOps.MmJpegMeanTolX100}")
  }

  test("resize-after-JPEG error budget: faithful pass with headroom; " +
      "a channel swap through the resample fails structurally") {
    assume(ready)
    // calibration: nearest-neighbor passes decoded pixels through
    // untouched, so the WORST per-doc mean deviation of resize-after-
    // faithful-decode must clear the budget with the same >=1.6x
    // headroom discipline as the decode gate
    val payloads = TextOps.mmJpegBytes(spark, sfDir).collect()
    val errs = payloads
      .map { case (id, bytes) => TextOps.jpegResizeMeanErrX100(id, bytes) }
    val worst = errs.map(_._3).max
    info(s"resize-after-decode mean deviation band: " +
      s"${errs.map(_._3).min / 100.0}–${worst / 100.0} levels " +
      s"(budget ${TextOps.MmJpegMeanTolX100 / 100.0})")
    assert(worst * 16L <= TextOps.MmJpegMeanTolX100 * 10L,
      s"budget must hold >=1.6x headroom over the worst faithful " +
        s"resize: worst=$worst budget=${TextOps.MmJpegMeanTolX100}")
    // the gate's verdict column agrees end to end
    val all = TextOps.mmResizeJpeg(spark, sfDir).collect()
    assert(all.nonEmpty && all.forall(_.getLong(3) == 1L),
      "every faithful resize must sit inside the error budget")
    // a channel swap INSIDE the resize path (the classic BGR/RGB bug
    // at the resample boundary): run the SAME kernel with a channel-
    // SWAPPED expected-pixel formula — the gradients keep b − r >= 59
    // at every source pixel, so the swap cannot hide behind the
    // subsample — and assert it lands beyond TWICE the budget. (A
    // transposed-axes negative would NOT separate here by design: the
    // gradient is near-symmetric in x and y, so axis bugs are the
    // lossless ring's pixel-exact digests' job — mm_resize_image
    // catches them; this gate owns the channel/content failure modes.)
    val (id, bytes) = payloads.find(_._1 == 5L).get
    val (_, _, swappedMeanX100) = TextOps.jpegResizeMeanErrX100(id, bytes,
      expected = (pid, x, y) => {
        val p = TextOps.mmJpegPixel(pid, x, y)
        ((p & 0xFF) << 16) | (p & 0xFF00) | ((p >> 16) & 0xFF)
      })
    assert(swappedMeanX100 > 2L * TextOps.MmJpegMeanTolX100,
      s"channel swap through the resize must land far outside the " +
        s"budget: $swappedMeanX100 vs ${TextOps.MmJpegMeanTolX100}")
    // corrupt payloads fail naming the record through the same kernel
    val e = intercept[IllegalArgumentException] {
      TextOps.jpegResizeMeanErrX100(23L, bytes.take(20))
    }
    assert(e.getMessage.contains("doc 23"), e.getMessage)
  }
}
