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
}
