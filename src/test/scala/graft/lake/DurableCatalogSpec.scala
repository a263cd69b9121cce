package graft.lake

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers
import java.nio.file.Files

/** Cross-session catalog durability (the Glue-catalog persistence the
  * reference relies on): a table created through CatalogOps in one JVM
  * must be visible to a completely fresh JVM sharing only the metastore
  * path. Spawns two subprocess sessions — in-JVM "new sessions" share
  * SharedState and would prove nothing.
  */
class DurableCatalogSpec extends AnyFunSuite with Matchers {

  private def runPhase(phase: String, wh: String, ms: String,
                       data: String): String = {
    val java = s"${System.getProperty("java.home")}/bin/java"
    val addOpens = Seq(
      "java.base/java.lang", "java.base/java.lang.invoke",
      "java.base/java.lang.reflect", "java.base/java.io",
      "java.base/java.net", "java.base/java.nio",
      "java.base/java.util", "java.base/java.util.concurrent",
      "java.base/java.util.concurrent.atomic",
      "java.base/sun.nio.ch", "java.base/sun.nio.cs",
      "java.base/sun.security.action", "java.base/sun.util.calendar"
    ).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
    val cmd = Seq(java) ++ addOpens ++ Seq(
      "-Xmx2g", "-cp", System.getProperty("java.class.path"),
      "graft.lake.DurableCatalogMain", phase, wh, ms, data)
    val proc = new ProcessBuilder(cmd: _*).redirectErrorStream(true).start()
    val out = new String(proc.getInputStream.readAllBytes())
    val rc = proc.waitFor()
    withClue(s"phase=$phase rc=$rc output:\n$out") { rc shouldBe 0 }
    out
  }

  test("a table created in one JVM is readable from a fresh JVM via the durable catalog") {
    val base = Files.createTempDirectory("graft-durable").toString
    val wh = s"$base/warehouse"
    val ms = s"$base/metastore_db"
    val data = s"$base/durable_demo_data"
    val created = runPhase("create", wh, ms, data)
    created should include("CREATE_OK rows=3")
    // fresh JVM: only the metastore db + parquet files are shared
    val read = runPhase("read", wh, ms, data)
    read should include("READ_OK p1=2 total=3")
  }
}
