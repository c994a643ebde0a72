package graft.ext

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video payloads travel as
  * opaque `binary` columns with typed metadata structs; decode /
  * feature-extraction runs as a partition-wise batch operator.
  *
  * The container has no image/audio codecs, so the decode kernel is a
  * clearly-marked DETERMINISTIC STUB (`decodeStub`): it synthesizes
  * plausible metadata + features from the bytes. Everything around it —
  * the binary column, the schema, the `mapPartitions` batch shape, the
  * partition sizing — is the real Spark plumbing a production decoder
  * (JNI/ffmpeg/jpeg) would drop into.
  */
object Multimodal {

  /** Typed decode output: one row per asset. */
  final case class DecodedAsset(
      doc_id: Long,
      n_bytes: Int,
      width: Int,
      height: Int,
      channels: Int,
      mean_byte: Double)

  /** DETERMINISTIC STUB decode kernel — replace with a real codec.
    * Signature and batch shape (Iterator[partition] → Iterator[rows])
    * are what a JNI decoder needs: per-partition init (here: none),
    * streaming over rows, no per-row setup cost. */
  def decodeStub(bytes: Array[Byte]): (Int, Int, Int, Double) = {
    // ??? real codec goes here; stub derives fake dims from content
    val n = bytes.length
    val width = 16 + (n % 64)
    val height = 16 + ((n / 64) % 64)
    val channels = 3
    var sum = 0L
    var i = 0
    while (i < n) { sum += (bytes(i) & 0xff); i += 1 }
    val mean = if (n == 0) 0.0 else sum.toDouble / n
    (width, height, channels, mean)
  }

  /** documents.text re-cast as a binary asset column (the test corpus
    * has no real media; utf-8 bytes stand in for the payload). */
  def assets(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, dir)
      .select($"doc_id", $"text".cast("binary").as("payload"))
  }

  /** Partition-wise decode: the Scala analog of a pandas-UDF
    * `mapInPandas` batch decoder. */
  def decode(s: SparkSession, dir: String): Dataset[DecodedAsset] = {
    import s.implicits._
    assets(s, dir)
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          val (w, h, c, mean) = decodeStub(bytes)
          DecodedAsset(id, bytes.length, w, h, c, mean)
        }
      }
  }

  /** DETERMINISTIC STUB resize kernel: a real implementation would
    * decode, scale with an interpolation kernel, and re-encode; the stub
    * models the metadata contract (target box, aspect-preserving). */
  def resizeStub(width: Int, height: Int, maxDim: Int): (Int, Int) = {
    // ??? real scaler goes here
    val m = math.max(width, height)
    if (m <= maxDim) (width, height)
    else (width * maxDim / m, height * maxDim / m)
  }

  // ---- REAL decode path (round 19): Netpbm P6 needs NO codec library
  // — the format is a whitespace-tokenized ASCII header (`P6 <w> <h>
  // <maxval>`) followed by w·h·3 raw RGB bytes — so a genuine
  // byte-level image decoder CAN exist in this zero-egress container.
  // The corpus ships no media, so payloads are PLANTED deterministically
  // from doc_id (the txt_pii_scrub discipline: synthesize the hazard,
  // prove the handling); the DECODER never sees the formula — it parses
  // the actual bytes — and the DuckDB oracle predicts the channel
  // statistics ARITHMETICALLY from doc_id, so a header misparse, an RGB
  // stride slip, or a truncated-read bug flips the hash. The jpeg/audio
  // kernels above remain honest stubs; this is the same mapPartitions
  // batch shape with a real parser dropped in.

  /** Deterministic P6 payload: w = 4 + id%13, h = 3 + id%7, maxval 255,
    * pixel byte k = (id·31 + k·7) mod 256. */
  def encodePpm(docId: Long): Array[Byte] = {
    val w = 4 + (docId % 13).toInt
    val h = 3 + (docId % 7).toInt
    val header = s"P6\n$w $h\n255\n".getBytes("US-ASCII")
    val px = new Array[Byte](w * h * 3)
    var k = 0
    while (k < px.length) {
      px(k) = ((docId * 31 + k.toLong * 7) % 256).toByte
      k += 1
    }
    header ++ px
  }

  /** Decoded P6 stats: one row per asset. */
  final case class PpmStats(
      doc_id: Long, n_bytes: Long, width: Int, height: Int, maxval: Int,
      mean_r: Double, mean_g: Double, mean_b: Double)

  /** REAL P6 header parse: tokenizes the header (whitespace-separated,
    * as the Netpbm spec requires — it never assumes the writer's exact
    * spacing), validates magic/maxval/raster length, and returns
    * (w, h, maxval, rasterOffset). Throws on malformed input — the
    * registered entries' payloads are all valid; an ingest pipeline
    * would wrap this in the quarantine pattern (Ingest.rawFromJsonLines). */
  private def parsePpmHeader(docId: Long, bytes: Array[Byte]): (Int, Int, Int, Int) = {
    require(bytes.length >= 2 && bytes(0) == 'P' && bytes(1) == '6',
      s"not a P6 payload for doc $docId")
    var i = 2
    def skipWs(): Unit = {
      while (i < bytes.length &&
        (bytes(i) == ' ' || bytes(i) == '\n' || bytes(i) == '\t' || bytes(i) == '\r')) i += 1
    }
    def readInt(): Int = {
      skipWs()
      var v = 0
      require(i < bytes.length && bytes(i) >= '0' && bytes(i) <= '9',
        s"bad P6 header int for doc $docId at byte $i")
      while (i < bytes.length && bytes(i) >= '0' && bytes(i) <= '9') {
        v = v * 10 + (bytes(i) - '0'); i += 1
      }
      v
    }
    val w = readInt(); val h = readInt(); val maxval = readInt()
    // exactly ONE whitespace byte separates maxval from the raster
    i += 1
    require(maxval == 255, s"unsupported maxval $maxval for doc $docId")
    require(bytes.length - i == w * h * 3,
      s"P6 raster length ${bytes.length - i} != ${w * h * 3} for doc $docId")
    (w, h, maxval, i)
  }

  /** REAL P6 decode: parse + per-channel means from the raw bytes. */
  def decodePpm(docId: Long, bytes: Array[Byte]): PpmStats = {
    val (w, h, maxval, off) = parsePpmHeader(docId, bytes)
    var sr = 0L; var sg = 0L; var sb = 0L
    var k = 0
    val n = w * h * 3
    while (k < n) {
      val v = bytes(off + k) & 0xff
      (k % 3: @annotation.switch) match {
        case 0 => sr += v
        case 1 => sg += v
        case _ => sb += v
      }
      k += 1
    }
    val px = (w * h).toDouble
    PpmStats(docId, bytes.length.toLong, w, h, maxval,
      sr / px, sg / px, sb / px)
  }

  /** Resized-raster stats: one row per asset. */
  final case class ResizedStats(
      doc_id: Long, width: Int, height: Int, resized_w: Int, resized_h: Int,
      mean_r: Double, mean_g: Double, mean_b: Double)

  /** REAL nearest-neighbor P6 resize — resampling is pure index
    * arithmetic, so like the parser it needs no codec: the output box
    * comes from [[resizeStub]]'s aspect-preserving rule (real integer
    * arithmetic, shared with the metadata entry), and each output
    * pixel (x, y) reads input pixel ((x·w) / rw, (y·h) / rh) — floor
    * mapping, the standard NN convention, reproduced exactly by
    * DuckDB's `//` in the oracle. Returns the resized raster's
    * per-channel means (the raster itself never leaves the kernel —
    * the stats are the gateable surface). */
  def resizePpmNearest(docId: Long, bytes: Array[Byte], maxDim: Int): ResizedStats = {
    val (w, h, _, off) = parsePpmHeader(docId, bytes)
    val (rw, rh) = resizeStub(w, h, maxDim)
    var sr = 0L; var sg = 0L; var sb = 0L
    var p = 0
    val n = rw * rh
    while (p < n) {
      val x = p % rw; val y = p / rw
      val xs = x * w / rw; val ys = y * h / rh
      val base = off + 3 * (ys * w + xs)
      sr += bytes(base) & 0xff
      sg += bytes(base + 1) & 0xff
      sb += bytes(base + 2) & 0xff
      p += 1
    }
    val px = n.toDouble
    ResizedStats(docId, w, h, rw, rh, sr / px, sg / px, sb / px)
  }

  val defs: Map[String, QueryDef] = Map(
    // REAL image decode end-to-end (no stub): deterministic planted P6
    // payloads → the byte-level [[decodePpm]] parser through the
    // mapPartitions batch path → per-channel statistics, hash-gated
    // against an oracle that PREDICTS the stats arithmetically from
    // doc_id without ever seeing the bytes. The decoder tokenizes the
    // header per the Netpbm spec (it does not assume the planter's
    // spacing), so a parse/stride/truncation bug cannot hide.
    "mm_ppm_decode" -> QueryDef(
      build = (s, dir) => {
        import s.implicits._
        val payloads = Tables.documents(s, dir).select($"doc_id").as[Long]
          .mapPartitions(_.map(id => (id, encodePpm(id)))).toDF("doc_id", "payload")
        payloads.as[(Long, Array[Byte])]
          .mapPartitions(_.map { case (id, bytes) => decodePpm(id, bytes) })
          .toDF()
          .select($"doc_id", $"n_bytes", $"width", $"height", $"maxval",
            round($"mean_r", 6).as("mean_r"),
            round($"mean_g", 6).as("mean_g"),
            round($"mean_b", 6).as("mean_b"))
      },
      oracle = Some("""
        WITH d AS (SELECT doc_id, 4 + doc_id % 13 AS w, 3 + doc_id % 7 AS h FROM documents),
        px AS (SELECT doc_id, w, h, unnest(generate_series(0, w*h*3 - 1)) AS k FROM d),
        b AS (SELECT doc_id, w, h, (doc_id*31 + k*7) % 256 AS v, k % 3 AS ch FROM px),
        agg AS (SELECT doc_id, w, h,
                       CAST(sum(CASE WHEN ch = 0 THEN v ELSE 0 END) AS BIGINT) AS sr,
                       CAST(sum(CASE WHEN ch = 1 THEN v ELSE 0 END) AS BIGINT) AS sg,
                       CAST(sum(CASE WHEN ch = 2 THEN v ELSE 0 END) AS BIGINT) AS sb
                FROM b GROUP BY 1, 2, 3)
        SELECT doc_id,
               CAST(strlen('P6' || chr(10) || CAST(w AS VARCHAR) || ' ' || CAST(h AS VARCHAR)
                           || chr(10) || '255' || chr(10)) + w*h*3 AS BIGINT) AS n_bytes,
               CAST(w AS INT) AS width, CAST(h AS INT) AS height, 255 AS maxval,
               round(CAST(sr AS DOUBLE) / (w*h), 6) AS mean_r,
               round(CAST(sg AS DOUBLE) / (w*h), 6) AS mean_g,
               round(CAST(sb AS DOUBLE) / (w*h), 6) AS mean_b
        FROM agg"""),
      doc = "REAL Netpbm P6 image decode (codec-free byte parser) through the mapPartitions batch path: planted deterministic payloads, per-channel means hash-gated against an arithmetic oracle that never sees the bytes"),

    // REAL resize end-to-end: decode + nearest-neighbor resample to an
    // 8-px box (aspect-preserving) — resampling is index arithmetic,
    // no codec needed — with the RESIZED raster's channel means gated
    // against the same never-sees-the-bytes arithmetic oracle. Some
    // planted images already fit the box (m ≤ 8) and pass through
    // unscaled, so both branches of the box rule are gated.
    "mm_ppm_resize" -> QueryDef(
      build = (s, dir) => {
        import s.implicits._
        val payloads = Tables.documents(s, dir).select($"doc_id").as[Long]
          .mapPartitions(_.map(id => (id, encodePpm(id)))).toDF("doc_id", "payload")
        payloads.as[(Long, Array[Byte])]
          .mapPartitions(_.map { case (id, bytes) => resizePpmNearest(id, bytes, 8) })
          .toDF()
          .select($"doc_id", $"width", $"height", $"resized_w", $"resized_h",
            round($"mean_r", 6).as("mean_r"),
            round($"mean_g", 6).as("mean_g"),
            round($"mean_b", 6).as("mean_b"))
      },
      oracle = Some("""
        WITH d AS (SELECT doc_id, 4 + doc_id % 13 AS w, 3 + doc_id % 7 AS h FROM documents),
        r AS (SELECT doc_id, w, h,
                     CASE WHEN greatest(w, h) <= 8 THEN w
                          ELSE (w * 8) // greatest(w, h) END AS rw,
                     CASE WHEN greatest(w, h) <= 8 THEN h
                          ELSE (h * 8) // greatest(w, h) END AS rh
              FROM d),
        px AS (SELECT doc_id, w, h, rw, rh, unnest(generate_series(0, rw*rh - 1)) AS p
               FROM r),
        m AS (SELECT doc_id, w, h, rw, rh,
                     ((((p // rw) * h) // rh) * w + (((p % rw) * w) // rw)) AS src_px
              FROM px),
        v AS (SELECT doc_id, w, h, rw, rh,
                     (doc_id*31 + (3*src_px + 0) * 7) % 256 AS vr,
                     (doc_id*31 + (3*src_px + 1) * 7) % 256 AS vg,
                     (doc_id*31 + (3*src_px + 2) * 7) % 256 AS vb
              FROM m),
        agg AS (SELECT doc_id, w, h, rw, rh,
                       CAST(sum(vr) AS BIGINT) AS sr,
                       CAST(sum(vg) AS BIGINT) AS sg,
                       CAST(sum(vb) AS BIGINT) AS sb
                FROM v GROUP BY 1, 2, 3, 4, 5)
        SELECT doc_id, CAST(w AS INT) AS width, CAST(h AS INT) AS height,
               CAST(rw AS INT) AS resized_w, CAST(rh AS INT) AS resized_h,
               round(CAST(sr AS DOUBLE) / (rw*rh), 6) AS mean_r,
               round(CAST(sg AS DOUBLE) / (rw*rh), 6) AS mean_g,
               round(CAST(sb AS DOUBLE) / (rw*rh), 6) AS mean_b
        FROM agg"""),
      doc = "REAL nearest-neighbor P6 resize (decode + index-arithmetic resample, codec-free): resized-raster channel means hash-gated against the arithmetic oracle; both box-rule branches exercised"),

    // binary-column metadata: pure relational ops over the payload —
    // byte length, first byte, content digest.
    "mm_binary_meta" -> QueryDef(
      build = (s, dir) => {
        import s.implicits._
        assets(s, dir).select(
          $"doc_id",
          octet_length($"payload").as("n_bytes"),
          ascii($"payload".cast("string")).as("first_byte"),
          md5($"payload".cast("string")).as("content_md5"))
      },
      oracle = Some("""
        SELECT doc_id,
               strlen(text) AS n_bytes,
               ascii(substr(text, 1, 1)) AS first_byte,
               md5(text) AS content_md5
        FROM documents"""),
      doc = "multimodal: opaque binary payload column + metadata projection"),

    // stubbed decode + feature extraction through the mapPartitions
    // batch path. Deterministic, so it gets a full oracle: the stub's
    // arithmetic is re-expressed in SQL (ascii-only corpus ⇒ byte
    // values = code points).
    "mm_decode_features" -> QueryDef(
      build = (s, dir) => {
        import s.implicits._
        decode(s, dir).toDF().select(
          $"doc_id", $"n_bytes", $"width", $"height", $"channels",
          round($"mean_byte", 4).as("mean_byte"))
      },
      oracle = Some("""
        WITH b AS (SELECT doc_id, strlen(text) AS n,
                          list_transform(string_split(text, ''), c -> ascii(c)) AS bytes
                   FROM documents)
        SELECT doc_id, n AS n_bytes,
               16 + (n % 64) AS width,
               16 + ((n // 64) % 64) AS height,
               3 AS channels,
               round(CAST(list_sum(bytes) AS DOUBLE) / n, 4) AS mean_byte
        FROM b"""),
      doc = "multimodal: partition-wise stub decode (mapPartitions batch shape)"),

    // resize: metadata-level transform chained after decode; the stub's
    // integer arithmetic is re-expressed in SQL for the oracle.
    "mm_resize" -> QueryDef(
      build = (s, dir) => {
        import s.implicits._
        decode(s, dir)
          .map { a =>
            val (w, h) = resizeStub(a.width, a.height, 32)
            (a.doc_id, a.width, a.height, w, h)
          }
          .toDF("doc_id", "width", "height", "out_w", "out_h")
      },
      oracle = Some("""
        WITH d AS (SELECT doc_id,
                          16 + (strlen(text) % 64) AS width,
                          16 + ((strlen(text) // 64) % 64) AS height
                   FROM documents),
        m AS (SELECT *, greatest(width, height) AS mx FROM d)
        SELECT doc_id, width, height,
               CASE WHEN mx <= 32 THEN width  ELSE width  * 32 // mx END AS out_w,
               CASE WHEN mx <= 32 THEN height ELSE height * 32 // mx END AS out_h
        FROM m"""),
      doc = "multimodal: aspect-preserving resize stub (typed Dataset map)"),

    // frame sampling: the video path — split the payload into fixed-size
    // chunks ("frames"), keep every 4th, fingerprint each. The explode
    // shape (1 asset row → n frame rows) is the real plumbing a video
    // sampler needs; partitioning carries over from the asset scan.
    "mm_frame_sample" -> QueryDef(
      build = (s, dir) => {
        import s.implicits._
        Tables.documents(s, dir)
          .filter(length($"text") > 0) // sequence(0,-1) would be [0,-1]
          .select($"doc_id", $"text",
            explode(expr("sequence(0, CAST(ceil(length(text) / 64.0) AS INT) - 1)")).as("chunk_idx"))
          .filter($"chunk_idx" % 4 === 0)
          .select($"doc_id", $"chunk_idx".as("frame_idx"),
            md5(expr("substr(text, chunk_idx * 64 + 1, 64)")).as("frame_md5"))
      },
      oracle = Some("""
        SELECT doc_id, chunk_idx AS frame_idx,
               md5(substr(text, chunk_idx * 64 + 1, 64)) AS frame_md5
        FROM documents,
             LATERAL (SELECT unnest(generate_series(0, CAST(ceil(strlen(text) / 64.0) AS INT) - 1)) AS chunk_idx) c
        WHERE chunk_idx % 4 = 0 AND strlen(text) > 0"""),
      doc = "multimodal: frame sampling (1→n explode, every 4th 64-byte chunk)")
  )
}
