package graft
import org.scalatest.funsuite.AnyFunSuite
class DocRunnerSpec extends AnyFunSuite {
  test("bulk doc example run") {
    val src = scala.io.Source.fromFile("/tmp/doc_examples.json").mkString
    // crude parse of the generated JSON list
    val entries = src.split("\\{").toSeq.drop(1).map { blk =>
      def f(k: String) = {
        val m = ("\"" + k + "\": \"(.*?)(?<!\\\\)\"").r.findFirstMatchIn(blk)
        m.map(_.group(1).replace("\\\"", "\"").replace("\\\\", "\\")).getOrElse("")
      }
      (f("family"), f("sql"), f("expect"))
    }
    val s = TestSpark.spark
    var ok = 0; var fail = 0
    val failures = collection.mutable.ArrayBuffer.empty[String]
    entries.foreach { case (fam, sql, expect) =>
      try {
        val r = Engine.sql(s, TestSpark.sfDir, sql).collect()(0)
        val got = if (r.isNullAt(0)) "null" else r.get(0).toString
        ok += 1
        // just record result for manual triage
        failures += s"OK|$fam|$sql|$expect|$got"
      } catch {
        case e: Throwable =>
          fail += 1
          failures += s"ERR|$fam|$sql|$expect|${e.getMessage.takeWhile(_ != '\n').take(120)}"
      }
    }
    java.nio.file.Files.write(java.nio.file.Paths.get("/tmp/doc_run_results.txt"),
      failures.mkString("\n").getBytes)
    info(s"ok=$ok err=$fail")
  }
}
