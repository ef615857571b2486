package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session for all specs (one JVM-wide session — Graft.session
  * asserts its load-bearing configs even on getOrCreate reuse). */
object TestSession {
  lazy val spark: SparkSession = Graft.session("graft-test")
}

trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSession.spark
  val Sf0001 = "/root/testdata/sf0.001"
}
