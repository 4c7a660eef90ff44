package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.graftbridge.SparkBridge

/** Column-API entry points for graft's custom Catalyst expressions. */
package object functions {

  /** 64-bit rolling polynomial fingerprint of a string — see
    * [[RollingHash64]].
    */
  def rolling_hash64(c: Column): Column =
    SparkBridge.toColumn(RollingHash64(SparkBridge.toExpression(c)))
}
