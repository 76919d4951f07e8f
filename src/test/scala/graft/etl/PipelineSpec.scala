package graft.etl

import java.nio.file.{Files, Paths}
import graft.SparkSpec

/** End-to-end golden tests: the reference's canonical fixture
  * (sample_data.txt) must produce the observed reference output — 27 rows ×
  * 17 columns, html(3)→json(9)→text(15), total_items=27 — modulo declared
  * divergences (SURVEY §7.4). Golden values captured by executing the
  * reference pipeline (FIXTURES.md F1). */
class PipelineSpec extends SparkSpec {

  private val expectedCols = Seq(
    "type", "source_index", "total_items", "amount", "budget_category",
    "completion", "department", "duration_hours", "employee_id", "impact",
    "maintenance_id", "name", "project", "quarter", "salary", "status",
    "team_size")

  private lazy val result: Pipeline.Result = {
    val files = Pipeline.readWholeFiles(spark, "/root/reference/sample_data.txt")
    Pipeline.process(spark, files)
  }

  test("F1: sample_data.txt → 27 rows × 17 columns in reference order") {
    assert(result.frame.columns.toSeq == expectedCols)
    assert(result.totalItems == 27)
    assert(result.frame.count() == 27)
  }

  test("F1: items_by_type = html 3, json 9, text 15") {
    assert(result.itemsByType == Map("html" -> 3L, "json" -> 9L, "text" -> 15L))
  }

  test("F1: row order html→json→text with per-kind ordinals") {
    val si = result.frame.select("source_index")
      .collect().map(_.getString(0)).toSeq
    val expected = (0 until 3).map(i => s"html_$i") ++
      (0 until 9).map(i => s"json_$i") ++ (0 until 15).map(i => s"text_$i")
    assert(si == expected)
  }

  test("F1: total_items = 27 stamped on every row as integer") {
    val vals = result.frame.select("total_items").distinct().collect()
    assert(vals.map(_.getLong(0)).toSeq == Seq(27L))
  }

  test("F1: schema artifact has the observed 18 fields incl pruned artifacts") {
    val expectedStats = Set(
      "amount", "budget_category", "completion", "department",
      "duration_hours", "employee_id", "impact", "maintenance_id", "name",
      "project", "quarter", "salary", "source_index", "status", "team_size",
      "title", "type", "word_count")
    assert(result.fieldStats.keySet == expectedStats)
  }

  test("F1: D-2 type clobber — maintenance record's type is 'json'") {
    import org.apache.spark.sql.functions.col
    val m = result.frame.filter(col("maintenance_id").isNotNull).collect()
    assert(m.length == 1)
    assert(m(0).getAs[String]("type") == "json")
  }

  test("F1: field stats semantics (present_in / nullable)") {
    val st = result.fieldStats
    // type + source_index present in all 27 records, never null
    assert(st("type") == Pipeline.FieldStats(Seq("str"), nullable = false, 27))
    assert(st("source_index").presentIn == 27)
    // employee_id only on the 3 employee JSON records → nullable because the
    // reference's nullable check spans ALL records (item.get → None when absent)
    assert(st("employee_id") == Pipeline.FieldStats(Seq("int"), nullable = true, 3))
    assert(st("salary").presentIn == 3)
    // word_count on html + text records (json records don't carry it)
    assert(st("word_count").presentIn == 18)
  }

  test("CSV single-file sink round-trips with header") {
    val out = Files.createTempDirectory("graft_csv").toString + "/cleaned_output.csv"
    Sinks.writeCsvSingleFile(result.frame, out)
    assert(Files.exists(Paths.get(out)))
    val back = spark.read.option("header", "true").csv(out)
    assert(back.count() == 27)
    assert(back.columns.toSeq == expectedCols)
  }

  test("schema + metadata JSON sinks write valid JSON") {
    val dir = Files.createTempDirectory("graft_json").toString
    Sinks.writeSchemaJson(result.fieldStats, s"$dir/dynamic_schema.json")
    Sinks.writeMetadataJson(
      Pipeline.RunMetadata("t0", "t1", "sample_data.txt", result.totalItems,
        result.itemsByType),
      s"$dir/processing_metadata.json")
    val sch = Json.mapper.readTree(Files.readString(Paths.get(s"$dir/dynamic_schema.json")))
    assert(sch.get("employee_id").get("present_in").asLong() == 3)
    val meta = Json.mapper.readTree(Files.readString(Paths.get(s"$dir/processing_metadata.json")))
    assert(meta.get("total_items").asLong() == 27)
    assert(meta.get("items_by_type").get("text").asLong() == 15)
  }

  test("append store is cumulative across runs (S8 semantics)") {
    val dir = Files.createTempDirectory("graft_store").toString
    Sinks.appendStore(result, "sample_data.txt", dir)
    Sinks.appendStore(result, "sample_data.txt", dir)
    assert(spark.read.parquet(s"$dir/processed_data").count() == 54)
    assert(spark.read.parquet(s"$dir/schemas").count() == 2)
  }

  test("Derby JDBC store appends with the reference DDL shape (S8)") {
    val dbDir = Files.createTempDirectory("graft_derby").toString + "/etl_db"
    val url = s"jdbc:derby:$dbDir"
    Sinks.appendStoreJdbc(result, "sample_data.txt", url)
    Sinks.appendStoreJdbc(result, "sample_data.txt", url)
    val props = new java.util.Properties()
    props.setProperty("driver", "org.apache.derby.jdbc.EmbeddedDriver")
    val pd = spark.read.jdbc(url, "processed_data", props)
    assert(pd.count() == 54)
    // autoincrement id + created_at default populated by the DB
    assert(pd.columns.toSet ==
      Set("ID", "FILENAME", "SOURCE_INDEX", "DATA_TYPE", "DATA_JSON", "CREATED_AT"))
    assert(pd.select("ID").distinct().count() == 54)
    assert(spark.read.jdbc(url, "schemas", props).count() == 2)
  }

  test("chunked large-file mode equals whole-file mode on the canonical fixture") {
    val chunked = Pipeline.processChunkedFile(spark, "/root/reference/sample_data.txt")
    assert(chunked.totalItems == result.totalItems)
    assert(chunked.itemsByType == result.itemsByType)
    assert(chunked.frame.columns.toSeq == result.frame.columns.toSeq)
    val a = result.frame.collect().map(_.toSeq).toSeq
    val b = chunked.frame.collect().map(_.toSeq).toSeq
    assert(a == b)
  }

  test("chunked mode: global dedup + consecutive ordinals across many segments") {
    // synthesize a multi-segment file: repeated JSON blocks (must dedup
    // globally to one) + unique JSON + text paragraphs
    val sb = new StringBuilder
    (0 until 500).foreach { i =>
      sb.append(s"""{"dup": 1}\n\n""")
      sb.append(s"""{"uniq": $i}\n\n""")
      sb.append(s"a text paragraph number $i with content\n\n")
    }
    val f = Files.createTempFile("graft_big", ".txt")
    Files.writeString(f, sb.toString)
    val r = Pipeline.processChunkedFile(spark, f.toString)
    // 1 deduped + 500 unique json + 500 text
    assert(r.itemsByType == Map("json" -> 501L, "text" -> 500L))
    val si = r.frame.select("source_index").collect().map(_.getString(0)).toSeq
    val expected = (0 until 501).map(i => s"json_$i") ++ (0 until 500).map(i => s"text_$i")
    assert(si == expected)
    // the duplicated block's first occurrence wins the ordinal race
    import org.apache.spark.sql.functions.col
    val dupRow = r.frame.filter(col("dup").isNotNull).collect()
    assert(dupRow.length == 1 && dupRow(0).getAs[String]("source_index") == "json_0")
  }

  test("chunked mode preserves duplicate text lines (whole-file parity)") {
    // whole-file mode dedups html/json/media by value but NOT text lines —
    // a file with a repeated separator-ish line must keep every occurrence
    // in chunked mode too, with identical ordinals.
    import spark.implicits._
    val content =
      "a repeated text line here\n\n{\"k\": 1}\n\n" +
        "a repeated text line here\n\nanother distinct line x\n\n" +
        "a repeated text line here\n\n{\"k\": 1}\n"
    val f = Files.createTempFile("graft_dup_text", ".txt")
    Files.writeString(f, content)
    val whole = Pipeline.process(spark, Seq((f.toString, content)).toDS())
    val chunked = Pipeline.processChunkedFile(spark, f.toString)
    assert(whole.itemsByType == Map("json" -> 1L, "text" -> 4L))
    assert(chunked.itemsByType == whole.itemsByType)
    assert(chunked.frame.collect().map(_.toSeq).toSeq ==
      whole.frame.collect().map(_.toSeq).toSeq)
  }

  test("processFile auto-routes by size threshold with identical output") {
    // canonical fixture: the two paths agree, so below-threshold routing
    // (default 256 MiB) must reproduce the whole-file result exactly...
    val auto = Pipeline.processFile(spark, "/root/reference/sample_data.txt")
    assert(auto.frame.collect().map(_.toSeq).toSeq ==
      result.frame.collect().map(_.toSeq).toSeq)
    assert(auto.itemsByType == result.itemsByType)
    // ...and above-threshold routing provably takes the CHUNKED path: an
    // html block spanning a blank line diverges between the modes (the
    // documented chunked-mode contract), so the route is observable
    import spark.implicits._
    val spanning = "<div>top half\n\nbottom half</div>\n\nplain text line\n"
    val f = Files.createTempFile("graft_route", ".txt")
    Files.writeString(f, spanning)
    val whole = Pipeline.process(spark, Seq((f.toString, spanning)).toDS())
    val chunked = Pipeline.processChunkedFile(spark, f.toString)
    assert(whole.itemsByType != chunked.itemsByType,
      "fixture no longer distinguishes the two paths — rebuild it")
    spark.conf.set(Pipeline.chunkThresholdKey, "1")
    try {
      val routed = Pipeline.processFile(spark, f.toString)
      assert(routed.itemsByType == chunked.itemsByType,
        "oversized file did not take the chunked path")
    } finally spark.conf.unset(Pipeline.chunkThresholdKey)
    // back to default: the same file takes the whole-file path again
    val small = Pipeline.processFile(spark, f.toString)
    assert(small.itemsByType == whole.itemsByType)
  }

  test("latin-1 fallback decode (S1)") {
    val bytes = Array[Byte](0x63, 0x61, 0x66, 0xE9.toByte) // "café" in latin-1
    assert(Pipeline.decodeWithFallback(bytes) == "café")
    val utf8 = "café".getBytes("UTF-8")
    assert(Pipeline.decodeWithFallback(utf8) == "café")
  }

  test("F2 vs F3: dynamic schema actually varies with input (the reference's one regression contract)") {
    import spark.implicits._
    val products = """{"product_name":"Laptop","price":1299.99,"in_stock":true,"categories":["electronics"],"rating":4.5}"""
    val users = """{"name":"Alice","age":30,"active":true}"""
    val s1 = Pipeline.process(spark, Seq(("a.txt", products)).toDS()).frame.columns.toSet
    val s2 = Pipeline.process(spark, Seq(("b.txt", users)).toDS()).frame.columns.toSet
    // console_test.html:125-133 — "Schema is SAME (BUG)" vs "Schema CHANGED (GOOD)"
    assert(s1 != s2)
    assert(s1.contains("product_name") && !s2.contains("product_name"))
    assert(s2.contains("age") && !s1.contains("age"))
  }

  test("JSON keys containing dots survive the pipeline (quoted column refs)") {
    import spark.implicits._
    val r = Pipeline.process(spark, Seq(("d.txt", """{"a.b": 1, "plain": "x"}""")).toDS())
    assert(r.totalItems == 1)
    assert(r.frame.columns.contains("a.b"))
    assert(r.fieldStats("a.b") == Pipeline.FieldStats(Seq("int"), nullable = false, 1))
    val row = r.frame.collect()(0)
    assert(row.getAs[Long]("a.b") == 1L)
  }

  test("sinks handle dotted JSON keys (quoted column refs)") {
    // a dotted ARRAY column exercises the CSV sink's to_json rewrite and the
    // store sinks' struct-over-all-columns — both crashed on bare col(name)
    import spark.implicits._
    val r = Pipeline.process(spark,
      Seq(("d2.txt", """{"a.b": [1, 2], "c.d": "y"}""")).toDS())
    val out = Files.createTempDirectory("graft_dot").toString
    Sinks.writeCsvSingleFile(r.frame, s"$out/cleaned_output.csv")
    val back = spark.read.option("header", "true").csv(s"$out/cleaned_output.csv")
    assert(back.count() == 1)
    assert(back.columns.contains("a.b") && back.columns.contains("c.d"))
    Sinks.appendStore(r, "d2.txt", s"$out/store")
    val dj = spark.read.parquet(s"$out/store/processed_data")
      .select("data_json").collect()(0).getString(0)
    assert(dj.contains("\"a.b\"") && dj.contains("\"c.d\""))
  }

  test("empty input → empty result") {
    import spark.implicits._
    val r = Pipeline.process(spark, Seq.empty[(String, String)].toDS())
    assert(r.totalItems == 0 && r.fieldStats.isEmpty)
  }

  test("F2: products JSON array → 3 json records, 8 schema fields") {
    import spark.implicits._
    val products =
      """[ {"product_name":"Laptop","price":1299.99,"in_stock":true,"categories":["electronics"],"rating":4.5},
        |  {"product_name":"Mouse","price":29.99,"in_stock":true,"categories":["accessories"],"rating":4.2},
        |  {"product_name":"Keyboard","price":79.99,"in_stock":false,"categories":["peripherals","input"],"rating":4.3} ]""".stripMargin
    val r = Pipeline.process(spark, Seq(("products.txt", products)).toDS())
    assert(r.itemsByType == Map("json" -> 3L))
    assert(r.frame.columns.toSet == Set("type", "source_index", "total_items",
      "product_name", "price", "in_stock", "categories", "rating"))
    // array + boolean types survive into the frame schema
    import org.apache.spark.sql.types._
    val sch = r.frame.schema
    assert(sch("in_stock").dataType == BooleanType)
    assert(sch("categories").dataType.isInstanceOf[ArrayType])
  }
}
