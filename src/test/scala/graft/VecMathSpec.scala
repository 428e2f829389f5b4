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
    assert(GraftFunctions.all.map(_._1) == Seq("quantized_cosine"))
  }
}
