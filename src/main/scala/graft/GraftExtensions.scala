package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier

import graft.functions.GraftFunctions

/** Spark extensions entry point: registers graft's native expressions at
  * session build time. Production wiring is
  * `spark.sql.extensions=graft.GraftExtensions`; tests and the driver
  * contract use [[GraftFunctions.register]] on an existing session instead.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftFunctions.all.foreach { case (name, info, builder) =>
      ext.injectFunction((FunctionIdentifier(name), info, builder))
    }
}
