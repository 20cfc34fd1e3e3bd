package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** SURVEY §1.4: the reference's schema-fallback chains map to explicit
  * StructTypes + PERMISSIVE JSON parsing with a corrupt-record column —
  * malformed payloads become inspectable rows instead of failures
  * (the fail-open posture of app/main.py:223-231).
  */
class JsonPermissiveSpec extends SparkSpec {
  import spark.implicits._

  private val schema = StructType(
    Seq(
      StructField("station_id", StringType),
      StructField("value", DoubleType),
      StructField("_corrupt_record", StringType)
    )
  )

  test("PERMISSIVE from_json: good rows parse, bad rows land in _corrupt_record") {
    val payloads = Seq(
      """{"station_id":"s1","value":1.5}""",
      """{"station_id":"s2","value":"not-a-number"}""", // type mismatch → partial row
      """{{{ definitely not json"""                     // malformed → corrupt record
    ).toDF("raw")
    val parsed = payloads.select(
      from_json(
        col("raw"),
        schema,
        Map("mode" -> "PERMISSIVE", "columnNameOfCorruptRecord" -> "_corrupt_record")
      ).as("j")
    ).select("j.station_id", "j.value", "j._corrupt_record")
    val rows = parsed.collect()
    assert(rows.length == 3)
    // good row parses fully
    assert(rows(0).getString(0) == "s1" && rows(0).getDouble(1) == 1.5 && rows(0).isNullAt(2))
    // type-mismatch row: field null, rest preserved
    assert(rows(1).getString(0) == "s2" && rows(1).isNullAt(1))
    // malformed row: everything null except the corrupt record payload
    assert(rows(2).isNullAt(0) && rows(2).isNullAt(1))
    assert(rows(2).getString(2).contains("definitely not json"))
  }

  test("fail-open routing: corrupt rows can be split off and counted, good rows proceed") {
    val payloads = (1 to 10).map(i => s"""{"station_id":"s$i","value":$i.0}""") :+ "oops"
    val parsed = payloads.toDF("raw").select(
      from_json(col("raw"), schema,
        Map("mode" -> "PERMISSIVE", "columnNameOfCorruptRecord" -> "_corrupt_record")).as("j")
    )
    val good = parsed.filter(col("j._corrupt_record").isNull)
    val bad = parsed.filter(col("j._corrupt_record").isNotNull)
    assert(good.count() == 10 && bad.count() == 1)
  }
}
