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
      Seq("quantized_cosine", "nfc_normalize", "zorder_key", "ndv_sketch",
        "bpe_encode"))
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

  test("zorder_key interleaves bits MSB-first; codegen agrees with eval") {
    import graft.functions.ZOrder
    // 2 dims, 2 bits: (x1 y1 x0 y0) — the 2x2-within-2x2 z curve
    assert(ZOrder.interleave(Array(0L, 0L), 2) == 0L)
    assert(ZOrder.interleave(Array(1L, 0L), 2) == 2L)  // x0=1 -> bit1
    assert(ZOrder.interleave(Array(0L, 1L), 2) == 1L)  // y0=1 -> bit0
    assert(ZOrder.interleave(Array(3L, 0L), 2) == 10L) // x=11 -> 1010
    assert(ZOrder.interleave(Array(3L, 3L), 2) == 15L)
    // curve locality: consecutive keys differ by small steps within a tile
    val keys = for (x <- 0L to 3L; y <- 0L to 3L)
      yield ((x, y), ZOrder.interleave(Array(x, y), 2))
    assert(keys.map(_._2).sorted == (0L to 15L), "16 cells must map to 16 distinct keys")

    GraftFunctions.register(spark)
    import spark.implicits._
    val viaPlan = Seq((3L, 0L), (1L, 2L), (0L, 3L))
      .toDF("x", "y")
      .select(call_function("zorder_key", col("x"), col("y")).as("k"))
      .collect().map(_.getLong(0)).toSeq
    // registered builder uses bits = 63/2 = 31: values stay in the low bits,
    // so small coords interleave identically to the 2-bit hand calc scaled up
    assert(viaPlan == Seq(
      ZOrder.interleave(Array(3L, 0L), 31),
      ZOrder.interleave(Array(1L, 2L), 31),
      ZOrder.interleave(Array(0L, 3L), 31)))
    // NULL coordinate clusters at 0
    val withNull = Seq((Some(1L), Option.empty[Long]))
      .toDF("x", "y")
      .select(call_function("zorder_key", col("x"), col("y")).as("k"))
      .collect()(0).getLong(0)
    assert(withNull == 0L)
  }

  test("nfc_normalize interpreted eval agrees with codegen") {
    val e = graft.functions.NfcNormalize(
      org.apache.spark.sql.catalyst.expressions.Literal("cafe\u0301 A\u030a"))
    assert(e.eval(null).toString == "caf\u00e9 \u00c5")
  }
}
