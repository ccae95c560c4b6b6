package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** One shared local session for the whole test run (Spark startup is the
  * dominant test cost; suites must not stop it).
  */
object TestSpark {
  lazy val spark: SparkSession = Sessions.local("graft-test")
  val sfDir = "/root/testdata/sf0.001"
}

abstract class SparkTestBase extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.spark
  def sfDir: String = TestSpark.sfDir

  /** Fresh temp directory for the block, recursively deleted afterwards
    * (tests that write parquet fixtures must not leak temp data across
    * runs).
    */
  def withTempDir[T](prefix: String)(body: String => T): T = {
    val dir = java.nio.file.Files.createTempDirectory(prefix)
    try body(dir.toString)
    finally {
      import java.nio.file.{Files, Path}
      import java.util.Comparator
      Files.walk(dir).sorted(Comparator.reverseOrder[Path]())
        .forEach(p => Files.deleteIfExists(p))
    }
  }
}
