package graft.media

import graft.{Q, Tables}
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal column handling: image/audio/video payloads modeled as
  * opaque `binary` columns + typed metadata, per the builder mandate.
  *
  * The decode step is STUBBED (no image/audio libs in this container):
  * `FakeDecoder.decode` derives deterministic "media metadata" from
  * payload bytes. Everything around it — binary column schema,
  * batch-shaped partition processing (`mapPartitions`, the Scala
  * analog of a Pandas-UDF `mapInPandas` batch loop), partitioning —
  * is real and is what carries over to a cluster with real codecs.
  */
object MediaQueries {

  /** A decoded media record; the schema a real decoder would emit. */
  final case class MediaMeta(doc_id: Long, n_bytes: Int, width: Int,
      height: Int, channels: Int, n_frames: Int, media_kind: String)

  /** STUB decoder ("???" analog): deterministic fake metadata from
    * payload length — replace with a real codec on a cluster. */
  object FakeDecoder {
    def decode(docId: Long, payload: Array[Byte], kind: String): MediaMeta = {
      val n = payload.length
      MediaMeta(docId, n, 64 + n % 512, 64 + (n * 7) % 512, 3,
        1 + n / 1000, kind)
    }
  }

  /** Batch-shaped decode over binary payloads: one decoder instance
    * per partition (the expensive-init pattern of real codecs), rows
    * streamed through it lazily. */
  def decodePartitions(docs: DataFrame): Dataset[MediaMeta] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"),
        col("source"))
      .as[(Long, Array[Byte], String)]
      .mapPartitions { rows =>
        rows.map { case (id, payload, src) =>
          FakeDecoder.decode(id, payload, src)
        }
      }
  }

  val all: Seq[Q] = Seq(
    // Declarative twin of the mapPartitions pipeline — same stub
    // arithmetic in pure SQL so DuckDB can oracle the plumbing
    // (schema, payload byte lengths, derived metadata).
    Q("m_multimodal", Some("""
      SELECT doc_id, n_bytes,
             64 + n_bytes % 512 AS width,
             64 + (n_bytes * 7) % 512 AS height,
             3 AS channels,
             1 + CAST(FLOOR(n_bytes / 1000.0) AS INT) AS n_frames,
             source AS media_kind
      FROM (SELECT doc_id,
                   CAST(OCTET_LENGTH(ENCODE(text)) AS INT) AS n_bytes,
                   source
            FROM documents) t
    """)) { t =>
      t.documents
        .select(col("doc_id"),
          length(encode(col("text"), "UTF-8")).as("n_bytes"), col("source"))
        .select(col("doc_id"), col("n_bytes"),
          (lit(64) + col("n_bytes") % 512).as("width"),
          (lit(64) + (col("n_bytes") * 7) % 512).as("height"),
          lit(3).as("channels"),
          (lit(1) + floor(col("n_bytes") / 1000.0).cast("int")).as("n_frames"),
          col("source").as("media_kind"))
    },

    // FRAME SAMPLING over "video" payloads (pipeline mandate): up to 4
    // uniformly spaced frames per document — frame i = the i-th 64-byte
    // slice of the payload, fingerprinted; ts from a fixed 25 fps
    // clock. The decode is the same honest stub (no codecs in the
    // container); the Spark-side plumbing is the real thing: per-row
    // frame-index generation (map-side transform + explode, no
    // shuffle until a consumer aggregates), byte-range slicing, one
    // output row per sampled frame. Both engines slice BYTES — the
    // engine substrings the BINARY payload directly; DuckDB cannot
    // slice or hash BLOBs, so both sides fingerprint the HEX
    // rendering of the slice (2 hex chars per byte — byte-exact and
    // safe on multibyte text; a slice may split a codepoint, which
    // is fine because the bytes are never decoded back to a string).
    // MediaSpec pins the multibyte case against hand-computed UTF-8
    // byte offsets.
    Q("m_media_frames", Some("""
      WITH m AS (
        SELECT doc_id, HEX(ENCODE(text)) AS hx,
               1 + CAST(FLOOR(OCTET_LENGTH(ENCODE(text)) / 64.0) AS INT)
                 AS n_frames
        FROM documents),
      f AS (
        SELECT doc_id, hx, n_frames,
               UNNEST(list_distinct(list_transform([0, 1, 2, 3],
                 j -> CAST(FLOOR(j * (n_frames - 1) / 3.0) AS INT))))
                 AS frame_idx
        FROM m)
      SELECT doc_id, frame_idx, frame_idx * 40 AS ts_ms,
             MD5(SUBSTR(hx, frame_idx * 128 + 1, 128)) AS frame_fp
      FROM f
    """)) { t =>
      frameSample(t.fan(t.documents))
    },

    // NEAR-DUP VIDEO detection by frame-fingerprint overlap — the
    // multimodal twin of d_ngram_jaccard: two "videos" are near-dups
    // when their sampled-frame fingerprint sets overlap (re-encodes,
    // trims and container changes keep most frames; the stub decoder
    // stands in for a real perceptual frame hash). Inverted index on
    // frame_fp with a df<=1000 hot-frame prune (intros/black frames
    // would otherwise pair half the corpus), pairs generated only
    // inside a fingerprint's posting list — bounded by posting-list
    // size, never corpus². One shared shuffle on frame_fp; set sizes
    // join back on doc_id.
    Q("m_media_dedup", Some("""
      WITH m AS (
        SELECT doc_id, HEX(ENCODE(text)) AS hx,
               1 + CAST(FLOOR(OCTET_LENGTH(ENCODE(text)) / 64.0) AS INT)
                 AS n_frames
        FROM documents),
      f AS (
        SELECT doc_id, hx,
               UNNEST(list_distinct(list_transform([0, 1, 2, 3],
                 j -> CAST(FLOOR(j * (n_frames - 1) / 3.0) AS INT))))
                 AS frame_idx
        FROM m),
      fr AS (
        SELECT DISTINCT doc_id,
               MD5(SUBSTR(hx, frame_idx * 128 + 1, 128)) AS frame_fp
        FROM f),
      keep AS (SELECT frame_fp FROM fr GROUP BY frame_fp
               HAVING COUNT(*) <= 1000),
      p AS (SELECT fr.doc_id, fr.frame_fp FROM fr JOIN keep USING (frame_fp)),
      sz AS (SELECT doc_id, COUNT(*) AS nf FROM p GROUP BY doc_id),
      pr AS (SELECT x.doc_id AS a, y.doc_id AS b,
                    CAST(COUNT(*) AS INT) AS common
             FROM p x JOIN p y ON x.frame_fp = y.frame_fp
                               AND x.doc_id < y.doc_id
             GROUP BY x.doc_id, y.doc_id)
      SELECT a, b, common,
             ROUND(CAST(common AS DOUBLE)
                   / (sa.nf + sb.nf - common), 4) AS jac
      FROM pr
      JOIN sz sa ON sa.doc_id = pr.a
      JOIN sz sb ON sb.doc_id = pr.b
      WHERE CAST(common AS DOUBLE) / (sa.nf + sb.nf - common) >= 0.5
    """)) { t =>
      // The frame-fingerprint kernel (hex-encode the whole doc, slice
      // 128-char windows, MD5 each) is the expensive part and the
      // posting list is consumed THREE times (set sizes, both sides
      // of the pair self-join) — without materialization Catalyst
      // re-runs the kernel once per consumer (5 scans in the plan).
      // Checkpoint the distinct frame list once (kernel runs ONCE)
      // and the df-pruned posting list once (the join runs once).
      val frames = frameSample(t.fan(t.documents))
        .select(col("doc_id"), col("frame_fp")).distinct()
        .localCheckpoint()
      val keep = frames.groupBy("frame_fp")
        .agg(count(lit(1)).as("df")).filter(col("df") <= 1000)
        .select("frame_fp")
      val p = frames.join(keep, "frame_fp").localCheckpoint()
      val sz = p.groupBy("doc_id").agg(count(lit(1)).as("nf"))
      val pairs = p.as("x").join(p.as("y"), "frame_fp")
        .filter(col("x.doc_id") < col("y.doc_id"))
        .groupBy(col("x.doc_id").as("a"), col("y.doc_id").as("b"))
        .agg(count(lit(1)).cast("int").as("common"))
      val jac = col("common").cast("double") /
        (col("na") + col("nb") - col("common"))
      pairs
        .join(sz.select(col("doc_id").as("a"), col("nf").as("na")), "a")
        .join(sz.select(col("doc_id").as("b"), col("nf").as("nb")), "b")
        .filter(jac >= 0.5)
        .select(col("a"), col("b"), col("common"),
          round(jac, 4).as("jac"))
    },

    // MEDIA QUALITY GATE — the metadata-driven keep/drop filter every
    // multimodal curation pipeline runs right after decode (too-small
    // images, degenerate aspect ratios, trivial/runaway durations).
    // Works purely on the decoded-metadata columns (the stub
    // arithmetic, declaratively mirrored), so on a cluster it is a
    // map-side projection over the decode output with the SAME gate
    // expressions — no shuffle, and the first-failing-rule reason
    // uses one CASE chain that codegen folds into the scan. Emits
    // every doc with its verdict (not just survivors): the reject
    // histogram is the curation dashboard's first chart.
    Q("m_media_quality", Some("""
      WITH m AS (
        SELECT doc_id, n_bytes,
               64 + n_bytes % 512 AS width,
               64 + (n_bytes * 7) % 512 AS height,
               1 + CAST(FLOOR(n_bytes / 1000.0) AS INT) AS n_frames
        FROM (SELECT doc_id,
                     CAST(OCTET_LENGTH(ENCODE(text)) AS INT) AS n_bytes
              FROM documents) t)
      SELECT doc_id, width, height, n_frames,
             CASE WHEN width < 128 OR height < 128 THEN 'too_small'
                  WHEN width > 4.0 * height OR height > 4.0 * width
                       THEN 'bad_aspect'
                  WHEN n_bytes < 120 THEN 'too_short'
                  ELSE 'ok' END AS verdict
      FROM m
    """)) { t =>
      val nBytes = length(encode(col("text"), "UTF-8")).cast("int")
      t.documents
        .select(col("doc_id"), nBytes.as("n_bytes"))
        .select(col("doc_id"),
          (lit(64) + col("n_bytes") % 512).as("width"),
          (lit(64) + (col("n_bytes") * 7) % 512).as("height"),
          (lit(1) + floor(col("n_bytes") / 1000.0).cast("int"))
            .as("n_frames"),
          col("n_bytes"))
        .select(col("doc_id"), col("width"), col("height"), col("n_frames"),
          when(col("width") < 128 || col("height") < 128, "too_small")
            .when(col("width") > lit(4.0) * col("height") ||
              col("height") > lit(4.0) * col("width"), "bad_aspect")
            .when(col("n_bytes") < 120, "too_short")
            .otherwise("ok").as("verdict"))
    },

    // AUDIO SEGMENTATION (pipeline mandate — the audio leg of the
    // modality triple beside m_multimodal's image metadata and
    // m_media_frames' video sampling): the payload is treated as
    // 8-bit 16 kHz PCM (1 byte = 1 sample — the honest stub; a real
    // container parses a codec here), cut into 256-sample windows
    // (16 ms), up to the first 8 segments per document. Per segment:
    // start offset, REAL slice byte-length (the last window is
    // partial — length arithmetic is data-derived, not assumed),
    // and the segment fingerprint over the hex rendering of the raw
    // byte slice (the m_media_frames convention — byte-exact, safe
    // across multibyte boundaries, and DuckDB-restatable). Plumbing
    // is the real thing: map-side sequence+explode, binary substr,
    // no shuffle until a consumer aggregates.
    Q("m_audio_segments", Some("""
      WITH m AS (
        SELECT doc_id, HEX(ENCODE(text)) AS hx,
               OCTET_LENGTH(ENCODE(text)) AS n_samples
        FROM documents),
      f AS (
        SELECT doc_id, hx, n_samples,
               UNNEST(range(0, LEAST(
                 CAST(CEIL(n_samples / 256.0) AS INT), 8))) AS seg_idx
        FROM m WHERE n_samples > 0)
      SELECT doc_id, CAST(seg_idx AS INT) AS seg_idx,
             CAST(seg_idx * 16 AS INT) AS start_ms,
             CAST(LEAST(n_samples - seg_idx * 256, 256) AS INT)
               AS seg_samples,
             MD5(SUBSTR(hx, seg_idx * 512 + 1, 512)) AS seg_fp
      FROM f
    """)) { t =>
      val payload = encode(col("text"), "UTF-8")
      t.fan(t.documents)
        .select(col("doc_id"), payload.as("payload"),
          length(payload).cast("long").as("n_samples"))
        // n_samples = 0 guard: Spark's sequence(0, -1) COUNTS DOWN
        // ([0, -1]) where DuckDB's range(0, 0) is empty — an empty
        // payload must emit no segments on both engines.
        .filter(col("n_samples") > 0)
        .select(col("doc_id"), col("payload"), col("n_samples"),
          explode(sequence(lit(0),
            least(ceil(col("n_samples") / 256.0).cast("int"), lit(8))
              - 1)).as("seg_idx"))
        .select(col("doc_id"), col("seg_idx").cast("int").as("seg_idx"),
          (col("seg_idx") * 16).cast("int").as("start_ms"),
          least(col("n_samples") - col("seg_idx") * 256L, lit(256L))
            .cast("int").as("seg_samples"),
          md5(hex(col("payload").substr(
            (col("seg_idx") * 256 + 1).cast("int"), lit(256))))
            .as("seg_fp"))
    },

    // MEDIA RESIZE / THUMBNAILING (pipeline mandate — the resolution
    // normalization every multimodal curation run does right after
    // the quality gate): fit-within-256×256 preserving aspect ratio,
    // NEVER upscaling (scale = min(256/w, 256/h, 1) — the standard
    // thumbnail contract), output dims floored with a 1px floor guard.
    // The pixel resample is the honest stub: nearest-neighbor BYTE
    // decimation of the payload to ≤1024 samples (sample i reads
    // byte ⌊i·n/n_out⌋ — the exact index arithmetic a NN image
    // resampler runs per axis), fingerprinted over the hex rendering
    // (the m_media_frames convention). Cross-engine determinism:
    // both sides evaluate the IDENTICAL IEEE double expression tree
    // for scale/dims/indices, so FLOOR agrees bit-for-bit; the
    // displayed scale is 4dp-rounded, the dims use the raw value.
    // Plumbing is the real thing and shuffle-free: per-row in-row
    // transform + array_join, map-side only — at 100 TB this is one
    // pass over the payload bytes with CPU parallelism from fan().
    Q("m_media_resize", Some("""
      WITH m AS (
        SELECT doc_id, HEX(ENCODE(text)) AS hx,
               CAST(OCTET_LENGTH(ENCODE(text)) AS INT) AS n_bytes
        FROM documents),
      d AS (
        SELECT doc_id, hx, n_bytes,
               64 + n_bytes % 512 AS width,
               64 + (n_bytes * 7) % 512 AS height,
               LEAST(n_bytes, 1024) AS n_out
        FROM m WHERE n_bytes > 0),
      s AS (
        SELECT *, LEAST(256.0 / width, 256.0 / height, 1.0) AS sc
        FROM d)
      SELECT doc_id, width, height,
             CAST(GREATEST(1, FLOOR(width * sc)) AS INT) AS out_w,
             CAST(GREATEST(1, FLOOR(height * sc)) AS INT) AS out_h,
             ROUND(sc, 4) AS scale,
             CAST(GREATEST(1, FLOOR(width * sc)) *
                  GREATEST(1, FLOOR(height * sc)) * 3 AS BIGINT)
               AS est_bytes,
             MD5(list_aggregate(list_transform(range(0, n_out),
               i -> SUBSTR(hx, CAST(FLOOR(i * n_bytes /
                      CAST(n_out AS DOUBLE)) AS INT) * 2 + 1, 2)),
               'string_agg', '')) AS thumb_fp
      FROM s
    """)) { t =>
      val payload = encode(col("text"), "UTF-8")
      val base = t.fan(t.documents)
        .select(col("doc_id"), hex(payload).as("hx"),
          length(payload).cast("int").as("n_bytes"))
        // Empty payload: nothing to resize on either engine (and
        // sequence(0, -1) would count DOWN — the audio-entry trap).
        .filter(col("n_bytes") > 0)
        .select(col("doc_id"), col("hx"), col("n_bytes"),
          (lit(64) + col("n_bytes") % 512).as("width"),
          (lit(64) + (col("n_bytes") * 7) % 512).as("height"),
          least(col("n_bytes"), lit(1024)).as("n_out"))
        .withColumn("sc", least(lit(256.0) / col("width"),
          lit(256.0) / col("height"), lit(1.0)))
      base.select(col("doc_id"), col("width"), col("height"),
        greatest(lit(1), floor(col("width") * col("sc"))).cast("int")
          .as("out_w"),
        greatest(lit(1), floor(col("height") * col("sc"))).cast("int")
          .as("out_h"),
        round(col("sc"), 4).as("scale"),
        (greatest(lit(1), floor(col("width") * col("sc"))) *
          greatest(lit(1), floor(col("height") * col("sc"))) * 3)
          .cast("long").as("est_bytes"),
        expr("""md5(array_join(transform(sequence(0, n_out - 1),
            i -> substring(hx,
                   cast(floor(cast(i as bigint) * n_bytes / n_out) as int)
                     * 2 + 1, 2)),
          ''))""").as("thumb_fp"))
    },

    // MEDIA FEATURE EXTRACTION (pipeline mandate — the
    // feature-vector pass between decode and the embedding index):
    // a 16-bin nibble histogram over the payload bytes (the
    // byte-histogram descriptor real pipelines compute for
    // content-type routing and near-dup blocking), L1-normalized to
    // 4dp fractions, plus the derived scalars every curation
    // dashboard keys on — dominant bin (integer-exact argmax with
    // lowest-bin tie-break), its share, and the histogram entropy
    // (ROUND(,4) absorbs libm ulp, the repo's libm convention).
    // Shuffle-free by construction: counts come from
    // length-minus-replace over the hex rendering — 16 map-side
    // string passes per row, no explode, no exchange; at 100 TB the
    // cost is one fan()-parallel scan of the payload bytes. The
    // features land in the SAME shape the ANN family consumes
    // (fractions = a 16-dim unit-L1 vector), so the output is the
    // bridge row between the media suite and s_ann_*/s_embed_*.
    Q("m_media_features", Some(s"""
      WITH m AS (
        SELECT doc_id, HEX(ENCODE(text)) AS hx,
               CAST(2 * OCTET_LENGTH(ENCODE(text)) AS INT) AS tot
        FROM documents),
      c AS (
        SELECT doc_id, tot,
               ${MediaSql.hexDigits.zipWithIndex.map { case (h, i) =>
                 s"LENGTH(hx) - LENGTH(REPLACE(hx, '$h', '')) AS c$i"
               }.mkString(",\n               ")}
        FROM m WHERE tot > 0),
      g AS (SELECT *, GREATEST(${(0 until 16).map("c" + _)
               .mkString(", ")}) AS cmax FROM c)
      SELECT doc_id, CAST(tot / 2 AS BIGINT) AS n_bytes,
             ${(0 until 16).map(i =>
               s"ROUND(CAST(c$i AS DOUBLE) / tot, 4) AS f$i")
               .mkString(",\n             ")},
             CAST(CASE ${(0 until 16).map(i =>
               s"WHEN c$i = cmax THEN $i").mkString(" ")}
               END AS INT) AS top_bin,
             ROUND(CAST(cmax AS DOUBLE) / tot, 4) AS top_frac,
             ROUND(-(${(0 until 16).map(i =>
               s"CASE WHEN c$i > 0 THEN (CAST(c$i AS DOUBLE) / tot) * " +
               s"LN(CAST(c$i AS DOUBLE) / tot) ELSE 0.0 END")
               .mkString(" + ")}) + 0.0, 4) AS entropy
      FROM g
    """)) { t =>
      val payload = encode(col("text"), "UTF-8")
      val m = t.fan(t.documents)
        .select(col("doc_id"), hex(payload).as("hx"),
          (length(payload) * 2).cast("int").as("tot"))
        .filter(col("tot") > 0)
      val withCounts = MediaSql.hexDigits.zipWithIndex
        .foldLeft(m) { case (df, (h, i)) =>
          df.withColumn(s"c$i",
            expr(s"length(hx) - length(replace(hx, '$h', ''))"))
        }
        .withColumn("cmax",
          greatest((0 until 16).map(i => col(s"c$i")): _*))
      val frac = (i: Int) => col(s"c$i").cast("double") / col("tot")
      // The trailing `+ 0.0` (here and in the oracle) normalizes the
      // single-nibble corner: every term is 0.0, the negation yields
      // IEEE -0.0, and Spark's BigDecimal round drops the sign where
      // DuckDB's keeps it — `-0.0 + 0.0 = +0.0` pins both engines.
      val entTerm = (i: Int) => when(col(s"c$i") > 0,
        frac(i) * log(frac(i))).otherwise(lit(0.0))
      val topBin = (0 until 16).foldRight(lit(null)
          .cast("int").asInstanceOf[org.apache.spark.sql.Column]) {
        case (i, rest) => when(col(s"c$i") === col("cmax"), i)
          .otherwise(rest)
      }
      withCounts.select(
        Seq(col("doc_id"), (col("tot") / 2).cast("long").as("n_bytes")) ++
        (0 until 16).map(i => round(frac(i), 4).as(s"f$i")) ++
        Seq(topBin.as("top_bin"),
          round(col("cmax").cast("double") / col("tot"), 4)
            .as("top_frac"),
          round(-(0 until 16).map(entTerm)
            .reduce(_ + _) + lit(0.0), 4).as("entropy")): _*)
    },
  )

  /** The 16 hex digits in Spark/DuckDB `hex()` rendering order
    * (uppercase) — one spelling for both the oracle SQL generator
    * and the engine-side counters. */
  private[media] object MediaSql {
    val hexDigits: Seq[String] =
      Seq("0", "1", "2", "3", "4", "5", "6", "7",
        "8", "9", "A", "B", "C", "D", "E", "F")
  }

  /** ≤4 uniformly spaced 64-byte frames per document, fingerprinted
    * on the hex rendering of the raw byte slice. Shared by the
    * registry entry and the multibyte MediaSpec. */
  def frameSample(docs: DataFrame): DataFrame = {
    val payload = encode(col("text"), "UTF-8")
    val nFrames = lit(1) + floor(length(payload) / 64.0).cast("int")
    docs
      .select(col("doc_id"), payload.as("payload"),
        nFrames.as("n_frames"))
      .select(col("doc_id"), col("payload"),
        explode(array_distinct(transform(sequence(lit(0), lit(3)),
          j => floor(j * (col("n_frames") - 1) / 3.0).cast("int"))))
          .as("frame_idx"))
      .select(col("doc_id"), col("frame_idx"),
        (col("frame_idx") * 40).as("ts_ms"),
        md5(hex(col("payload").substr(col("frame_idx") * 64 + 1, lit(64))))
          .as("frame_fp"))
  }

}
