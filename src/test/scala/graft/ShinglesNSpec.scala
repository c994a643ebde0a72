package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the r22 one-pass token-window expressions bit-for-bit against
  * the HOF lambda formulations they replaced, over the real corpus AND
  * synthetic edge rows, codegen and interpreted:
  *  - shingles_n(toks, n)  ≡ array_distinct(transform(...concat_ws...))
  *  - shingle_wins(toks,n) ≡ transform(... struct(j, concat_ws ...))
  *  - bigrams(toks)        ≡ transform(... struct(toks[i], toks[i+1]))
  */
class ShinglesNSpec extends AnyFunSuite {

  private def lambdaShingles(n: Int): String = {
    val parts = (0 until n).map(k => s"toks[i + $k]").mkString(", ")
    s"CASE WHEN size(toks) >= $n THEN array_distinct(transform(sequence(0, size(toks)-$n), " +
      s"i -> concat_ws(' ', $parts))) ELSE array() END"
  }
  private def lambdaWins(n: Int): String = {
    val parts = (0 until n).map(k => s"toks[j + $k]").mkString(", ")
    s"CASE WHEN size(toks) >= $n THEN transform(sequence(0, size(toks)-$n), " +
      s"j -> struct(j AS j, concat_ws(' ', $parts) AS sh)) ELSE array() END"
  }
  private val lambdaBigrams =
    "CASE WHEN size(toks) >= 2 THEN transform(sequence(0, size(toks)-2), " +
      "i -> struct(toks[i] AS w1, toks[i+1] AS w2)) ELSE array() END"

  test("expressions ≡ lambda formulations on corpus + synthetic rows, both eval paths") {
    val spark = Sessions.local(cores = 4, appName = "shinglesn-spec")
    try {
      import spark.implicits._
      graft.functions.ShinglesN.register(spark)
      graft.functions.ShingleWins.register(spark)
      graft.functions.BigramWins.register(spark)

      val rnd = new scala.util.Random(11)
      val synth = (1 to 2000).map { _ =>
        val len = rnd.nextInt(20)
        (1 to len).map(_ => s"w${rnd.nextInt(6)}").mkString(" ")
      } ++ Seq("", "one", "a b", "a a a a a a a a a a", "x y z x y z x y")
      val synthDf = synth.toDF("text")
      val corpus = Tables.documents(spark, "/root/testdata/sf0.01").select($"text")

      def checkOn(df0: DataFrame, label: String): Unit = {
        val df = df0.withColumn("toks",
          expr(graft.ext.TextExpr.toksE)).select($"toks")
        for (mode <- Seq("CODEGEN_ONLY", "NO_CODEGEN")) {
          spark.conf.set("spark.sql.codegen.factoryMode", mode)
          for (n <- Seq(2, 3, 8)) {
            val bad = df.select(
              expr(s"shingles_n(toks, $n)").as("a"),
              expr(lambdaShingles(n)).as("b"),
              expr(s"shingle_wins(toks, $n)").as("wa"),
              expr(lambdaWins(n)).as("wb"))
              .filter(!($"a" <=> $"b") || !($"wa" <=> $"wb")).count()
            assert(bad == 0, s"$label/$mode: width $n diverged on $bad rows")
          }
          val badB = df.select(expr("bigrams(toks)").as("a"),
            expr(lambdaBigrams).as("b"))
            .filter(!($"a" <=> $"b")).count()
          assert(badB == 0, s"$label/$mode: bigrams diverged on $badB rows")
        }
        spark.conf.unset("spark.sql.codegen.factoryMode")
      }
      checkOn(synthDf, "synthetic")
      checkOn(corpus, "corpus")
      // shingles_n(_, 3) ≡ the r21 shingles3 expression
      graft.functions.Shingles3.register(spark)
      val d3 = corpus.withColumn("toks", expr(graft.ext.TextExpr.toksE))
        .filter(!(expr("shingles_n(toks, 3)") <=> expr("shingles3(toks)"))).count()
      assert(d3 == 0, "shingles_n(,3) != shingles3")
    } finally spark.stop()
  }
}
