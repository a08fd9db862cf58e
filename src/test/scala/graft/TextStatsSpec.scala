package graft

import org.apache.spark.sql.functions._

/** The single-pass TextStats kernel must reproduce the regex
  * formulations its counters replace (the oracle SQL is written
  * against those regex semantics), on real documents and on
  * adversarial edge cases (unicode, empty, all-whitespace).
  */
class TextStatsSpec extends SparkSpecBase {

  private def regexTwin = t.documents.select(col("doc_id"),
    length(col("text")).as("r_n_chars"),
    size(regexp_extract_all(col("text"), lit("(\\S+)"), lit(1)))
      .as("r_n_tokens"),
    length(regexp_replace(col("text"), "[^A-Za-z]", "")).as("r_n_alpha"),
    length(regexp_replace(col("text"), "[A-Za-z0-9\\s]", "")).as("r_n_punct"),
    length(regexp_replace(col("text"), "\\S", "")).as("r_n_ws"),
    size(regexp_extract_all(col("text"),
      lit("([A-Za-z]+|[0-9]|[^A-Za-z0-9\\s])"), lit(1))).as("r_bpe"))

  test("t_dedup_runs collapses stutter runs exactly, map-only plan") {
    val got = Registry.all.find(_.name == "t_dedup_runs").get.run(t)
    // Brute force in Scala: keep tokens whose predecessor differs.
    val expect = t.documents.select("doc_id", "text").collect().map {
      r =>
        val ws = r.getString(1).split(" ", -1)
        val kept = ws.zipWithIndex
          .filter { case (w, i) => i == 0 || w != ws(i - 1) }
          .map(_._1)
        (r.getLong(0), (ws.length.toLong, kept.length.toLong,
          kept.mkString(" ")))
    }.toMap
    got.collect().foreach { r =>
      val (nTok, nKept, cleaned) = expect(r.getLong(0))
      assert(r.getAs[Long]("n_tokens") == nTok)
      assert(r.getAs[Long]("n_kept") == nKept)
      assert(r.getAs[String]("cleaned_md5") ==
        java.security.MessageDigest.getInstance("MD5")
          .digest(cleaned.getBytes("UTF-8"))
          .map("%02x".format(_)).mkString)
    }
    // The repair is a per-row HOF: the plan must carry NO exchange —
    // at 100 TB it fuses into the scan stage.
    val plan = got.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"t_dedup_runs plan shuffles:\n$plan")
  }

  test("kernel counters equal the regex formulation on all documents") {
    val both = t.documents
      .select(col("doc_id"), expr("text_stats(text)").as("s"))
      .join(regexTwin, "doc_id")
    val bad = both.filter(
      col("s.n_chars") =!= col("r_n_chars") ||
        col("s.n_tokens") =!= col("r_n_tokens") ||
        col("s.n_alpha") =!= col("r_n_alpha") ||
        col("s.n_punct") =!= col("r_n_punct") ||
        col("s.n_ws") =!= col("r_n_ws") ||
        col("s.bpe_tokens") =!= col("r_bpe")).count()
    assert(bad == 0)
    assert(both.count() > 0)
  }

  test("kernel handles edge cases: empty, whitespace, unicode, digits") {
    val cases = Seq(
      "", "   ", "\t\n\r", "abc", "a b  c", "a1b2", "héllo wörld",
      "漢字テスト", "x—y–z", "12 34", "a.b,c;d", "émigré café",
      "mixed ASCII и кириллица 123!", "vtab")
    import spark.implicits._
    val df = cases.toDF("text")
      .select(col("text"), expr("text_stats(text)").as("s"),
        length(col("text")).as("r_n_chars"),
        size(regexp_extract_all(col("text"), lit("(\\S+)"), lit(1)))
          .as("r_n_tokens"),
        length(regexp_replace(col("text"), "[^A-Za-z]", "")).as("r_n_alpha"),
        length(regexp_replace(col("text"), "[A-Za-z0-9\\s]", ""))
          .as("r_n_punct"),
        length(regexp_replace(col("text"), "\\S", "")).as("r_n_ws"),
        size(regexp_extract_all(col("text"),
          lit("([A-Za-z]+|[0-9]|[^A-Za-z0-9\\s])"), lit(1))).as("r_bpe"))
    df.collect().foreach { r =>
      val s = r.getStruct(1)
      val label = r.getString(0)
      assert(s.getInt(0) == r.getInt(2), s"n_chars @ '$label'")
      assert(s.getInt(1) == r.getInt(3), s"n_tokens @ '$label'")
      assert(s.getInt(2) == r.getInt(4), s"n_alpha @ '$label'")
      assert(s.getInt(3) == r.getInt(5), s"n_punct @ '$label'")
      assert(s.getInt(4) == r.getInt(6), s"n_ws @ '$label'")
      assert(s.getInt(5) == r.getInt(7), s"bpe @ '$label'")
    }
  }

  test("text_stats null in, null out; resolves from extensions in SQL") {
    val r = spark.sql("SELECT text_stats(CAST(NULL AS STRING)) AS s")
      .collect().head
    assert(r.isNullAt(0))
    val ok = spark.sql("SELECT text_stats('ab 12.').n_tokens AS n")
      .collect().head.getInt(0)
    assert(ok == 2)
  }
}
