package graft

/** Public face of the engine's native Catalyst expressions (implemented
  * in the org.apache.spark.sql.graftshim package, which the private[sql]
  * extension surface requires).
  */
package object functions {
  val NativeFunctions: org.apache.spark.sql.graftshim.NativeFunctions.type =
    org.apache.spark.sql.graftshim.NativeFunctions
}
