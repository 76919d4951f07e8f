package graft.ext

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Engine-portable hash primitives.
  *
  * The dedup/similarity operators need hash functions that an external SQL
  * oracle (DuckDB) can reproduce bit-for-bit, so the declared queries can be
  * value-checked rather than rows-only-checked. Spark's `hash()`/`xxhash64`
  * are Spark-specific; md5 is universal. We take the first 15 hex chars of
  * md5 (60 bits — fits a signed 64-bit int) as a portable uniform hash.
  *
  * Everything here is a pure column expression: codegen'd, map-side, no
  * shuffle, no UDF.
  */
object PortableHash {

  /** 60-bit salted hash: BIGINT(md5(salt || s)[0,15)).
    * DuckDB: `CAST(concat('0x', substr(md5(salt || s), 1, 15)) AS BIGINT)`. */
  def md5Long(c: Column, salt: String = ""): Column = {
    val input = if (salt.isEmpty) c else concat(lit(salt), c)
    conv(substring(md5(input), 1, 15), 16, 10).cast("long")
  }
}
