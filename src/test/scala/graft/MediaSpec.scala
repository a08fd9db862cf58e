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
}
