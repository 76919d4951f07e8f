package graft.etl

import java.nio.file.Files
import graft.SparkSpec

/** Interactive-menu parity (reference main.py:112-215): the numbered REPL
  * drives the same actions as the subcommands. IO is injected, no TTY. */
class MenuSpec extends SparkSpec {

  private def run(script: String, inDir: String, outDir: String): String = {
    val in = new java.io.BufferedReader(new java.io.StringReader(script))
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.PrintStream(bos, true, "UTF-8")
    Main.menuLoop(spark, inDir, outDir, in, out)
    bos.toString("UTF-8")
  }

  test("menu: process → view outputs → invalid choice → exit") {
    val inDir = Files.createTempDirectory("graft_menu_in")
    val outDir = Files.createTempDirectory("graft_menu_out")
    Files.writeString(inDir.resolve("a.txt"), """{"k": 1, "name": "x"}""")
    val printed = run("1\n4\n9\n5\n", inDir.toString, outDir.toString)
    assert(printed.contains("SIMPLE ETL PIPELINE"))
    assert(printed.contains("Output files:"))
    assert(printed.contains("cleaned_output.csv"))
    assert(printed.contains("Invalid choice"))
    assert(printed.contains("Goodbye!"))
    assert(Files.exists(outDir.resolve("cleaned_output.csv")))
  }

  test("menu: option 3 without filename warns; EOF exits the loop") {
    val printed = run("3\n\n", "no_such_in", "no_such_out")
    assert(printed.contains("No filename provided"))
    assert(printed.contains("Goodbye!")) // readLine EOF → treated as exit
  }
}
