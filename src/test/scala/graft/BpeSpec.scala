package graft

import graft.ext.Bpe
import org.scalatest.funsuite.AnyFunSuite

/** Contract of the greedy merge-table BPE encoder (round 20):
  * algorithm semantics pinned with targeted merge tables, cascades of
  * the planted table hand-checked, and — the load-bearing case — the
  * priority encode proven ≡ the sequential rank-order replay over
  * EVERY distinct corpus pre-token, which is what licenses
  * `txt_bpe_encode`'s DuckDB oracle (an unrolled replay) to gate the
  * priority encoder. */
class BpeSpec extends AnyFunSuite {

  test("lowest-rank pair merges first (rank priority, not position)") {
    // table: (e,r) rank 0, (r,t) rank 1. "ert" must become [er, t] —
    // a position-greedy or rank-ignoring encoder would emit [e, rt]
    val m = Vector("e" -> "r", "r" -> "t")
    assert(Bpe.encode("ert", m) == List("er", "t"))
  }

  test("one rule merges left-to-right, non-overlapping") {
    val m = Vector("a" -> "a")
    assert(Bpe.encode("aaaa", m) == List("aa", "aa"))
    assert(Bpe.encode("aaa", m) == List("aa", "a"))
    assert(Bpe.encode("aaaaa", m) == List("aa", "aa", "a"))
  }

  test("planted-table cascades: 3-deep chain and output-as-operand") {
    assert(Bpe.encode("scan") == List("scan"), "s+c, sc+a, sca+n must cascade")
    assert(Bpe.encode("the") == List("the"), "t+h, th+e must cascade")
    assert(Bpe.encode("row") == List("row"), "o+w then r+ow (merged operand)")
    assert(Bpe.encode("window") == List("w", "in", "d", "ow"))
    assert(Bpe.encode("stream") == List("st", "r", "e", "a", "m"))
    assert(Bpe.encode("query") == List("qu", "er", "y"))
    assert(Bpe.encode("x") == List("x"))
    assert(Bpe.encode("") == Nil)
  }

  test("priority encode ≡ rank-order replay over every corpus pre-token (licenses the oracle)") {
    val spark = Sessions.local(cores = 4, appName = "graft-bpe")
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val pieces = Tables.documents(spark, "/root/testdata/sf0.001")
      .select(explode(expr(
        "regexp_extract_all(text, '[a-z0-9]+|[^a-z0-9\\\\s]', 0)")).as("p"))
      .distinct().as[String].collect()
    assert(pieces.nonEmpty)
    // the cascades must actually FIRE on this corpus, not be vacuous
    assert(pieces.exists(p => Bpe.encode(p).exists(_.length >= 3)),
      "no >=3-char merged symbol produced — planted table no longer matches the corpus")
    for (p <- pieces)
      assert(Bpe.encode(p) == Bpe.replay(p),
        s"priority/replay divergence on piece '$p' — the table is no longer " +
          "well-formed and the unrolled-replay oracle would gate the wrong algorithm")
  }

  test("driver-local training is row-identical to the distributed round loop") {
    // r21: the registered txt_bpe_train runs Bpe.trainMergesLocal (one
    // corpus pass, vocabulary collected once, rounds local); this gate
    // pins it to the distributed loop the DuckDB oracle was derived
    // against — same argmax weighting, same tie-break, same merge
    // application, so the two must agree rank-for-rank
    val spark = Sessions.local(cores = 4, appName = "graft-bpe-train")
    val local = Bpe.trainMergesLocal(spark, "/root/testdata/sf0.001", 9)
    val dist = Bpe.trainMerges(spark, "/root/testdata/sf0.001", 9)
    assert(local == dist,
      s"local/distributed BPE training diverged:\n local=$local\n dist=$dist")
  }

  test("learned table: monotone counts, well-formed with a real cascade, priority ≡ replay") {
    val spark = Sessions.local(cores = 4, appName = "graft-bpe-train")
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val learned = Bpe.trainMerges(spark, "/root/testdata/sf0.001", 9)
    assert(learned.map(_._1) == (1 to 9), "ranks must be 1..9 in order")
    // argmax counts can only fall as merges consume pair mass
    val counts = learned.map(_._4)
    assert(counts.zip(counts.tail).forall { case (x, y) => x >= y },
      s"pair counts must be non-increasing: $counts")
    // learned tables are well-formed BY CONSTRUCTION — verify, and
    // require at least one multi-char operand so the law is not vacuous
    val merges = learned.map { case (_, a, b, _) => (a, b) }.toVector
    val outputs = merges.map { case (a, b) => a + b }
    for (((a, b), k) <- merges.zipWithIndex; op <- Seq(a, b) if op.length > 1)
      assert(outputs.indexOf(op) >= 0 && outputs.indexOf(op) < k,
        s"learned rule $k operand '$op' is not an earlier rule's output")
    assert(merges.exists { case (a, b) => a.length > 1 || b.length > 1 },
      "9 rounds produced no cascading merge on this corpus — law vacuous")
    // therefore priority ≡ replay holds under the LEARNED table too
    val pieces = Tables.documents(spark, "/root/testdata/sf0.001")
      .select(explode(expr(
        "regexp_extract_all(text, '[a-z0-9]+|[^a-z0-9\\\\s]', 0)")).as("p"))
      .distinct().as[String].collect()
    for (p <- pieces)
      assert(Bpe.encode(p, merges) == Bpe.replay(p, merges),
        s"priority/replay divergence under the learned table on '$p'")
  }

  test("well-formedness of the planted table (the equivalence precondition)") {
    // every non-single-char operand of rule k must be the output of a rule j < k
    val outputs = Bpe.Merges.map { case (a, b) => a + b }
    for (((a, b), k) <- Bpe.Merges.zipWithIndex; op <- Seq(a, b) if op.length > 1)
      assert(outputs.indexOf(op) >= 0 && outputs.indexOf(op) < k,
        s"rule $k operand '$op' is not an earlier rule's output")
    // and outputs are unique (a duplicate would make ranks ambiguous)
    assert(outputs.distinct.size == outputs.size)
  }
}
