package graft.etl

import com.fasterxml.jackson.core.JsonParser
import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.ObjectNode

/** JSON helpers on Jackson (already on Spark's classpath — no new deps).
  *
  * Parser configuration mirrors Python's `json.loads` (used by the reference
  * to validate candidate blocks, etl_pipeline.py:85-90): strict quoting, but
  * NaN/Infinity literals accepted.
  */
object Json {

  val mapper: ObjectMapper = {
    val m = new ObjectMapper()
    m.configure(JsonParser.Feature.ALLOW_NON_NUMERIC_NUMBERS, true)
    m
  }

  /** True iff `s` parses as a JSON object the way json.loads would accept. */
  def isValidObject(s: String): Boolean =
    try mapper.readTree(s).isObject
    catch { case _: Exception => false }

  def parseObject(s: String): ObjectNode =
    mapper.readTree(s).asInstanceOf[ObjectNode]

  /** Recursive flatten of nested objects with `_` separator; arrays and
    * primitives kept as-is (reference flatten_dict, etl_pipeline.py:139-151).
    */
  def flatten(node: ObjectNode, parentKey: String = "", sep: String = "_"): ObjectNode = {
    val out = mapper.createObjectNode()
    def walk(n: ObjectNode, prefix: String): Unit = {
      val it = n.fields()
      while (it.hasNext) {
        val e = it.next()
        val key = if (prefix.isEmpty) e.getKey else s"$prefix$sep${e.getKey}"
        e.getValue match {
          case o: ObjectNode => walk(o, key)
          case v: JsonNode => out.set[JsonNode](key, v)
        }
      }
    }
    walk(node, parentKey)
    out
  }
}
