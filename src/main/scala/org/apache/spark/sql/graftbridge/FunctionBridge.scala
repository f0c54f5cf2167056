package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier

/** Registers [[graft.GraftExtensions]]' SQL functions into a LIVE session's
  * function registry (the extensions hook only runs at session build).
  * Lives under `org.apache.spark.sql` for `sessionState` access, like
  * [[ColumnBridge]]; contains no Spark code of its own. */
object FunctionBridge {
  def register(spark: SparkSession): Unit =
    graft.GraftExtensions.functions.foreach { case (name, info, builder) =>
      spark.sessionState.functionRegistry
        .registerFunction(FunctionIdentifier(name), info, builder)
    }
}
