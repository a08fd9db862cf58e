package graft

import graft.media.MediaQueries

class MediaSpec extends SparkSpecBase {

  test("mapPartitions decode pipeline matches the declarative twin") {
    val typed = MediaQueries.decodePartitions(t.documents)
      .collect().map(m => m.doc_id -> (m.n_bytes, m.width, m.height,
        m.channels, m.n_frames)).toMap
    val sql = Registry.all.find(_.name == "m_multimodal").get.run(t)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Int]("n_bytes"), r.getAs[Int]("width"),
          r.getAs[Int]("height"), r.getAs[Int]("channels"),
          r.getAs[Int]("n_frames")))).toMap
    assert(typed == sql && typed.nonEmpty)
  }

  test("frame slicing is byte-offset-correct on multibyte text") {
    import org.apache.spark.sql.functions.col
    // 200 chars but 400 UTF-8 bytes: char==byte slicing would pick
    // the wrong window AND the wrong frame count.
    val text = "ü" * 150 + "héllo wörld φράση 文档 " * 4
    val bytes = text.getBytes("UTF-8")
    assert(bytes.length > text.length)
    val spark0 = spark
    import spark0.implicits._
    val rows = MediaQueries.frameSample(
        Seq((7L, text)).toDF("doc_id", "text"))
      .collect()
      .map(r => r.getAs[Int]("frame_idx") -> r.getAs[String]("frame_fp"))
      .toMap
    val nFrames = 1 + bytes.length / 64
    val expectedIdx = (0 to 3)
      .map(j => math.floor(j * (nFrames - 1) / 3.0).toInt).distinct
    assert(rows.keySet == expectedIdx.toSet)
    val mdRef = java.security.MessageDigest.getInstance("MD5")
    expectedIdx.foreach { i =>
      val slice = bytes.slice(i * 64, math.min(i * 64 + 64, bytes.length))
      val hexStr = slice.map(b => f"$b%02X").mkString
      val fp = mdRef.digest(hexStr.getBytes("UTF-8"))
        .map(b => f"$b%02x").mkString
      assert(rows(i) == fp, s"frame $i: byte slicing drifted")
    }
  }

  test("m_audio_segments: partial last window is real slice length, " +
    "fingerprints match hand-sliced bytes, cap at 8 segments") {
    import org.apache.spark.sql.functions._
    val rows = Registry.all.find(_.name == "m_audio_segments").get
      .run(t).collect()
      .groupBy(_.getAs[Long]("doc_id"))
    // Pick one real document and recompute its segments by hand.
    val doc = t.documents.orderBy("doc_id")
      .select("doc_id", "text").head()
    val id = doc.getLong(0)
    val bytes = doc.getString(1).getBytes("UTF-8")
    val nSeg = math.min(math.ceil(bytes.length / 256.0).toInt, 8)
    val segs = rows(id).sortBy(_.getAs[Int]("seg_idx"))
    assert(segs.length == nSeg)
    val mdRef = java.security.MessageDigest.getInstance("MD5")
    segs.foreach { r =>
      val i = r.getAs[Int]("seg_idx")
      assert(r.getAs[Int]("start_ms") == i * 16)
      val slice = bytes.slice(i * 256,
        math.min(i * 256 + 256, bytes.length))
      assert(r.getAs[Int]("seg_samples") == slice.length)
      val hexStr = slice.map(b => f"$b%02X").mkString
      val fp = mdRef.digest(hexStr.getBytes("UTF-8"))
        .map(b => f"$b%02x").mkString
      assert(r.getAs[String]("seg_fp") == fp, s"segment $i drifted")
    }
    // Nothing emits more than the 8-segment cap.
    rows.values.foreach(g => assert(g.length <= 8))
  }

  test("m_media_resize: fit-within-256 contract — never upscales, " +
      "preserves aspect within floor tolerance, byte-exact thumb fp") {
    val rows = Registry.all.find(_.name == "m_media_resize").get.run(t)
      .collect()
    assert(rows.nonEmpty)
    val mdRef = java.security.MessageDigest.getInstance("MD5")
    rows.foreach { r =>
      val (w, h) = (r.getAs[Int]("width"), r.getAs[Int]("height"))
      val (ow, oh) = (r.getAs[Int]("out_w"), r.getAs[Int]("out_h"))
      assert(ow <= 256 && oh <= 256, "thumbnail must fit within 256")
      assert(ow <= w && oh <= h, "resize never upscales")
      val sc = math.min(math.min(256.0 / w, 256.0 / h), 1.0)
      assert(ow == math.max(1, math.floor(w * sc).toInt))
      assert(oh == math.max(1, math.floor(h * sc).toInt))
      assert(r.getAs[Long]("est_bytes") == ow.toLong * oh * 3)
      assert(r.getAs[String]("thumb_fp").length == 32)
    }
    // Byte-exactness of the nearest-neighbor decimation on one doc.
    val doc = t.documents.orderBy("doc_id").limit(1).collect()(0)
    val bytes = doc.getAs[String]("text").getBytes("UTF-8")
    val n = bytes.length
    val nOut = math.min(n, 1024)
    val hexStr = (0 until nOut).map { i =>
      val b = math.floor(i.toDouble * n / nOut).toInt
      f"${bytes(b)}%02X"
    }.mkString
    val fp = mdRef.digest(hexStr.getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString
    val row = rows.find(_.getAs[Long]("doc_id") ==
      doc.getAs[Long]("doc_id")).get
    assert(row.getAs[String]("thumb_fp") == fp,
      "thumb fingerprint drifted from the reference decimation")
  }

  test("m_media_features: fractions L1-normalize, entropy bounded by " +
      "ln 16, dominant bin is the true integer argmax") {
    val rows = Registry.all.find(_.name == "m_media_features").get
      .run(t).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val fracs = (0 until 16).map(i => r.getAs[Double](s"f$i"))
      // 4dp rounding: the raw fractions sum to exactly 1.
      assert(math.abs(fracs.sum - 1.0) < 16 * 5e-5)
      val ent = r.getAs[Double]("entropy")
      assert(ent >= 0.0 && ent <= math.log(16.0) + 1e-9)
      val top = r.getAs[Int]("top_bin")
      val topFrac = r.getAs[Double]("top_frac")
      assert(fracs.forall(_ <= topFrac + 5e-5))
      assert(math.abs(fracs(top) - topFrac) < 1e-9,
        "dominant bin's fraction must equal top_frac")
    }
    // Ground truth on one doc: counts from the raw bytes.
    val doc = t.documents.orderBy("doc_id").limit(1).collect()(0)
    val hx = doc.getAs[String]("text").getBytes("UTF-8")
      .map(b => f"$b%02X").mkString
    val counts = "0123456789ABCDEF".map(c => hx.count(_ == c))
    val row = rows.find(_.getAs[Long]("doc_id") ==
      doc.getAs[Long]("doc_id")).get
    (0 until 16).foreach { i =>
      val expect = BigDecimal(counts(i).toDouble / hx.length)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(row.getAs[Double](s"f$i") - expect) < 1e-9,
        s"bin $i frequency drifted")
    }
    assert(row.getAs[Int]("top_bin") == counts.indexOf(counts.max))
  }
}
