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

  val defs: Map[String, QueryDef] = Map(
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
