package graft

import graft.etl.Decrypt
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class DecryptSpec extends AnyFunSuite {
  lazy val spark: SparkSession = Sessions.local(cores = 2, appName = "graft-crypto")

  test("PBKDF2-SHA512 derivation is deterministic, 32 bytes") {
    val salt = "0123456789abcdef".getBytes
    val k1 = Decrypt.deriveKey("correct horse", salt, 1000)
    val k2 = Decrypt.deriveKey("correct horse", salt, 1000)
    assert(k1.toSeq == k2.toSeq)
    assert(k1.length == 32)
    assert(Decrypt.deriveKey("other pass", salt, 1000).toSeq != k1.toSeq)
    assert(Decrypt.deriveKey("correct horse", salt, 1001).toSeq != k1.toSeq)
  }

  test("AES-GCM roundtrip; tampering fails closed") {
    val key = Decrypt.deriveKey("pass", "salt0000".getBytes, 100)
    val ct = Decrypt.encryptRandomIv("""{"body":"secret"}""", key)
    assert(Decrypt.decrypt(ct, key).contains("""{"body":"secret"}"""))
    // flip one ciphertext char → GCM auth must reject, not garble
    val tampered = ct.updated(20, if (ct(20) == 'A') 'B' else 'A')
    assert(Decrypt.decrypt(tampered, key).isEmpty)
    val wrongKey = Decrypt.deriveKey("wrong", "salt0000".getBytes, 100)
    assert(Decrypt.decrypt(ct, wrongKey).isEmpty)
  }

  test("decrypt_event UDF decrypts at the ingest edge") {
    import spark.implicits._
    Decrypt.register(spark)
    val salt = java.util.Base64.getEncoder.encodeToString("salty".getBytes)
    val key = Decrypt.deriveKey("p", "salty".getBytes, 10)
    val payload = Decrypt.encryptRandomIv("hello", key)
    val out = Seq(payload).toDF("content")
      .selectExpr(s"decrypt_event(content, 'p', '$salt', 10) AS plain")
      .collect()(0).getString(0)
    assert(out == "hello")
  }

  test("decrypt_event derives the PBKDF2 key ONCE per (pass, salt, iters), not per row") {
    import spark.implicits._
    Decrypt.register(spark)
    val salt = java.util.Base64.getEncoder.encodeToString("memosalt".getBytes)
    val key = Decrypt.deriveKeyCached("memo-pass", salt, 10)
    val rows = (1 to 1000).map(i => Decrypt.encryptRandomIv(s"msg$i", key))
    val before = Decrypt.deriveCount.get()
    val n = rows.toDF("content").repartition(2)
      .selectExpr(s"decrypt_event(content, 'memo-pass', '$salt', 10) AS plain")
      .filter("plain IS NOT NULL").count()
    assert(n == 1000)
    val derives = Decrypt.deriveCount.get() - before
    // at most one derivation per partition-thread; never one per row
    // (local-mode UDF closures share the executor JVM's cache)
    assert(derives <= 4, s"expected memoized derivation, got $derives derivations for 1000 rows")
  }

  test("pipeline decrypt never ships key material through the query plan") {
    import spark.implicits._
    import graft.etl.{CryptoConfig, Ingest}
    val pass = "hotpath-passphrase-7f3a"
    val saltB64 = java.util.Base64.getEncoder.encodeToString("hotsalt1".getBytes)
    val crypto = CryptoConfig(pass, saltB64, 10)
    val key = Decrypt.deriveKey(pass, "hotsalt1".getBytes, 10)
    val msgs = Seq(("$e1:x", Decrypt.encryptRandomIv("""{"body":"s"}""", key), true))
      .toDF("event_id", "content", "is_encrypted")
      .withColumn("error", org.apache.spark.sql.functions.lit(null: String))
    val out = Ingest.decryptMessages(msgs, crypto)
    // the passphrase/salt must live in the UDF closure, not plan text —
    // EXPLAIN output and the Spark UI SQL tab render plan literals
    val plans = out.queryExecution.toString + out.queryExecution.executedPlan.toString
    assert(!plans.contains(pass), "passphrase leaked into the query plan")
    assert(!plans.contains(saltB64), "salt leaked into the query plan")
    // and it still decrypts
    assert(out.select("content").collect()(0).getString(0) == """{"body":"s"}""")
  }

  test("decrypt_event_key uses a pre-derived key (no per-row derivation at all)") {
    import spark.implicits._
    Decrypt.register(spark)
    val key = Decrypt.deriveKey("kp", "keysalt1".getBytes, 10)
    val keyB64 = java.util.Base64.getEncoder.encodeToString(key)
    val payload = Decrypt.encryptRandomIv("direct", key)
    val out = Seq(payload).toDF("content")
      .selectExpr(s"decrypt_event_key(content, '$keyB64') AS plain")
      .collect()(0).getString(0)
    assert(out == "direct")
  }
}
