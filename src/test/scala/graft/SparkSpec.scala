package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Shared local SparkSession for all specs (getOrCreate -> one JVM-wide
  * session, so the suite doesn't pay session startup per spec). */
trait SparkSpec extends AnyFunSuite with BeforeAndAfterAll {
  lazy val spark: SparkSession = SparkSpec.session
  override def afterAll(): Unit = () // session shared; JVM exit cleans up
}

object SparkSpec {
  lazy val session: SparkSession =
    Graft.session("graft-test", "local[4]", shufflePartitions = 4)
}
