package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.VectorFunctions

/** DotProduct native expression: codegen and interpreted paths agree with
  * plain Scala math, across element types and edge shapes.
  */
class VectorExpressionsSpec extends AnyFunSuite {
  private def spark = TestSpark.spark

  private val vecs: Seq[(Seq[Float], Seq[Float])] = Seq(
    (Seq(1f, 2f, 3f), Seq(4f, 5f, 6f)),
    (Seq(-1.5f, 0f, 2.25f), Seq(3f, -4f, 0.5f)),
    (Seq.empty[Float], Seq.empty[Float]),
    (Seq(1f, 2f), Seq(3f)), // unequal length: common prefix
    (Seq(Float.MaxValue / 2, 1f), Seq(2f, 2f)))

  test("float arrays: matches Scala reference math") {
    val schema = StructType(Seq(
      StructField("a", ArrayType(FloatType)), StructField("b", ArrayType(FloatType))))
    val df = spark.createDataFrame(
      java.util.Arrays.asList(vecs.map(v => Row(v._1, v._2)): _*), schema)
    val got = df.select(VectorFunctions.dot(col("a"), col("b"))).collect().map(_.getDouble(0))
    val want = vecs.map { case (a, b) =>
      a.zip(b).map { case (x, y) => x.toDouble * y.toDouble }.sum }
    got.zip(want).foreach { case (g, w) => assert(math.abs(g - w) <= math.abs(w) * 1e-15) }
  }

  test("mixed float/double arrays accumulate in double") {
    val df = spark.sql("SELECT array(CAST(0.1 AS FLOAT), CAST(0.2 AS FLOAT)) AS a, array(0.1D, 0.2D) AS b")
    val got = df.select(VectorFunctions.dot(col("a"), col("b"))).collect().head.getDouble(0)
    val want = 0.1f.toDouble * 0.1 + 0.2f.toDouble * 0.2
    assert(got == want)
  }

  test("null array input yields null; sqNorm is self-dot") {
    val df = spark.sql("SELECT CAST(NULL AS ARRAY<FLOAT>) AS a, array(CAST(3 AS FLOAT), CAST(4 AS FLOAT)) AS b")
    assert(df.select(VectorFunctions.dot(col("a"), col("b"))).collect().head.isNullAt(0))
    assert(df.select(VectorFunctions.sqNorm(col("b"))).collect().head.getDouble(0) == 25.0)
  }

  test("dot_product is callable from SQL text after registration") {
    graft.GraftSession.register(spark)
    val got = spark.sql(
      "SELECT dot_product(array(CAST(1 AS FLOAT), CAST(2 AS FLOAT)), array(3.0D, 4.0D)) AS d")
      .collect().head.getDouble(0)
    assert(got == 11.0)
  }

  test("agrees with the HOF formulation on real embeddings") {
    val emb = graft.sources.Tables(spark, TestSpark.sf0001, "embeddings").limit(100)
    val both = emb.select(
      VectorFunctions.sqNorm(col("embedding")).as("native"),
      aggregate(col("embedding"), lit(0.0),
        (acc, x) => acc + x.cast("double") * x.cast("double")).as("hof"))
    assert(both.filter(col("native") =!= col("hof")).count() == 0)
  }
}
