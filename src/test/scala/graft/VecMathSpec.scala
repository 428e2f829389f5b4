package graft

import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions

class VecMathSpec extends SparkSpec {

  private def df = {
    import spark.implicits._
    Seq(
      (1L, Array(1.0f, 0.0f, 0.0f), Array(1.0f, 0.0f, 0.0f)),   // identical
      (2L, Array(1.0f, 0.0f, 0.0f), Array(0.0f, 1.0f, 0.0f)),   // orthogonal
      (3L, Array(1.0f, 1.0f, 0.0f), Array(1.0f, -1.0f, 0.0f)),  // orthogonal
      (4L, Array(0.5f, 0.25f, -0.125f), Array(-0.5f, -0.25f, 0.125f)), // opposite
      (5L, Array(0.0f, 0.0f, 0.0f), Array(1.0f, 0.0f, 0.0f))    // zero norm
    ).toDF("id", "a", "b")
  }

  test("quantized_cosine matches expected values (codegen path)") {
    GraftFunctions.register(spark)
    val rows = df.select(col("id"), call_function("quantized_cosine", col("a"), col("b")).as("c"))
      .orderBy("id").collect()
    assert(rows(0).getDouble(1) == 1.0)
    assert(rows(1).getDouble(1) == 0.0)
    assert(rows(2).getDouble(1) == 0.0)
    assert(rows(3).getDouble(1) == -1.0)
    assert(rows(4).isNullAt(1), "zero-norm vector must yield NULL")
  }

  test("quantized_cosine interpreted eval agrees with codegen") {
    GraftFunctions.register(spark)
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.util.ArrayData
    import org.apache.spark.sql.types.{ArrayType, FloatType}
    def lit(xs: Array[Float]) =
      Literal(ArrayData.toArrayData(xs), ArrayType(FloatType))
    val e = graft.functions.QuantizedCosine(
      lit(Array(0.3f, -0.7f, 0.2f)), lit(Array(0.1f, 0.9f, -0.4f)))
    val interpreted = e.eval(null).asInstanceOf[Double]
    val viaPlan = df.limit(1)
      .select(call_function("quantized_cosine",
        typedLit(Seq(0.3f, -0.7f, 0.2f)), typedLit(Seq(0.1f, 0.9f, -0.4f))).as("c"))
      .collect()(0).getDouble(0)
    assert(interpreted == viaPlan)
  }

  test("registered via SparkSessionExtensions wiring list") {
    assert(GraftFunctions.all.map(_._1) ==
      Seq("quantized_cosine", "nfc_normalize"))
  }

  test("nfc_normalize composes decomposed sequences (codegen path)") {
    GraftFunctions.register(spark)
    import spark.implicits._
    val decomposed = "cafe\u0301"        // e + combining acute
    val composed = "caf\u00e9"
    val rows = Seq(
      (1L, decomposed),
      (2L, composed),
      (3L, "A\u030aB\u0301c"), // A+ring composes; B+acute has no precomposed form
      (4L, "plain ascii"),
      (5L, null.asInstanceOf[String]))
      .toDF("id", "s")
      .select(col("id"), call_function("nfc_normalize", col("s")).as("n"),
        length(call_function("nfc_normalize", col("s"))).as("len"))
      .orderBy("id").collect()
    assert(rows(0).getString(1) == composed && rows(0).getInt(2) == 4)
    assert(rows(1).getString(1) == composed)
    assert(rows(2).getString(1) == "\u00c5B\u0301c",
      "ring composes to \u00c5; B+acute has no precomposed form and must survive")
    assert(rows(3).getString(1) == "plain ascii")
    assert(rows(4).isNullAt(1), "NULL input must stay NULL")
  }

  test("nfc_normalize interpreted eval agrees with codegen") {
    val e = graft.functions.NfcNormalize(
      org.apache.spark.sql.catalyst.expressions.Literal("cafe\u0301 A\u030a"))
    assert(e.eval(null).toString == "caf\u00e9 \u00c5")
  }
}
