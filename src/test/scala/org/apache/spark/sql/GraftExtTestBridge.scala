package org.apache.spark.sql

import org.apache.spark.sql.catalyst.analysis.FunctionRegistry

/** Test-only bridge: `SparkSessionExtensions.registerFunctions` is
  * private[sql] (session construction calls it); the extensions spec
  * needs it to exercise the injection path inside the shared-JVM suite.
  */
object GraftExtTestBridge {
  def register(ext: SparkSessionExtensions, reg: FunctionRegistry): Unit =
    ext.registerFunctions(reg)
}
