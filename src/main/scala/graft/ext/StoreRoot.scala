package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Shared store-root resolution for every persisted-state operator
  * family (dedup clusters, CDC chunk store, ANN/PQ indexes, streamed
  * pipeline state): the root is keyed by the source dir AND a cheap
  * corpus content fingerprint (row count + max id + order-free
  * bit_xor(xxhash64(id, content))), so a driver-side testdata
  * regeneration — even one that keeps the shape but changes content —
  * reseeds the store instead of probing a stale snapshot.
  *
  * r21 (ADVICE r20 items 2 and 4): one helper instead of four copies,
  * with two changes:
  *
  *  1. the fingerprint aggregation is MEMOIZED per (envKey, dir) for
  *     the JVM's lifetime — previously every invocation of a
  *     persisted-probe entry re-ran a full corpus scan just to
  *     re-derive the root it already knew (one extra scan per bench
  *     rep × four families). The staleness guard the scan implements
  *     is CROSS-run (a regeneration happens between driver runs, never
  *     mid-JVM while queries are executing), so a per-JVM memo keeps
  *     the guard exactly as strong where it matters and free where it
  *     doesn't. Tests that regenerate corpora use distinct dirs, which
  *     miss the memo by construction.
  *  2. the default store parent is resolved against the working
  *     directory (`target/<family>` under user.dir) instead of a
  *     hard-coded absolute path — same location when run from the
  *     repo root, portable elsewhere; the GRAFT_*_DIR env overrides
  *     are unchanged.
  */
private[ext] object StoreRoot {

  private val memo = new java.util.concurrent.ConcurrentHashMap[String, String]()

  def resolve(s: SparkSession, dir: String, envKey: String,
      defaultSubdir: String, table: (SparkSession, String) => DataFrame,
      idCol: String, contentCol: String): String =
    memo.computeIfAbsent(s"$envKey|$dir", _ => {
      val r = table(s, dir).agg(count(lit(1)), max(col(idCol)),
        expr(s"bit_xor(xxhash64($idCol, $contentCol))")).collect()(0)
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(dir.getBytes("UTF-8")).map("%02x".format(_)).mkString
      sys.env.getOrElse(envKey,
        new java.io.File(sys.props("user.dir"), s"target/$defaultSubdir").getPath) +
        s"/$md-n${r.getLong(0)}-m${r.getLong(1)}-x${java.lang.Long.toHexString(r.getLong(2))}"
    })
}
