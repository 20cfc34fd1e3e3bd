package graft

import org.scalatest.funsuite.AnyFunSuite

class PipelineConfigSpec extends AnyFunSuite {

  test("defaults match the reference") {
    val c = PipelineConfig.fromEnv(Map.empty)
    assert(c.sleepSeconds == 300 && c.retentionDays == 7 && c.nlRequestLimit == 280)
    assert(c.liveApi && !c.plOnlyAuto)
  }

  test("env values parse; CSV splits, trims, lowercases") {
    val c = PipelineConfig.fromEnv(Map(
      "PIPELINE_SLEEP_SECONDS" -> "60",
      "PIPELINE_LIVE_API" -> "false",
      "PL_ONLY_AUTO" -> "1",
      "NL_COMPONENTS" -> " PM25 , NO2 ,so2",
      "RETENTION_DAYS" -> "30"
    ))
    assert(c.sleepSeconds == 60 && !c.liveApi && c.plOnlyAuto && c.retentionDays == 30)
    assert(c.components == Seq("pm25", "no2", "so2"))
  }

  test("malformed values fail open to defaults") {
    val c = PipelineConfig.fromEnv(Map(
      "PIPELINE_SLEEP_SECONDS" -> "not-a-number",
      "NL_COMPONENTS" -> " , ,"
    ))
    assert(c.sleepSeconds == 300)
    assert(c.components == PipelineConfig().components)
  }
}
