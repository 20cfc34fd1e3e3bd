package graft

import org.scalatest.funsuite.AnyFunSuite

/** Reference-fidelity contract for the config surface (VERDICT r8 task
  * 7): every key of the reference's `.env.example` round-trips through
  * PipelineConfig with the reference's default (app/config.py Settings
  * dataclass) and the reference's parse rule.
  */
class PipelineConfigSpec extends AnyFunSuite {

  /** The COMPLETE `.env.example` key set (reference repo root). The
    * round-trip test below feeds every one of these; a key the parser
    * ignores would fail the distinct-values assertion. */
  private val envExampleKeys = Seq(
    "KAFKA_BOOTSTRAP", "KAFKA_TOPIC", "KAFKA_SECURITY_PROTOCOL",
    "KAFKA_SASL_MECHANISM", "KAFKA_SASL_USERNAME", "KAFKA_SASL_PASSWORD",
    "PIPELINE_LIVE_API", "PIPELINE_SLEEP_SECONDS",
    "POSTGRES_HOST", "POSTGRES_PORT", "POSTGRES_DB", "POSTGRES_USER",
    "POSTGRES_PASSWORD", "POSTGRES_SSLMODE",
    "PIPELINE_DE_BASE_URL", "PIPELINE_DE_STATIONS",
    "PIPELINE_NL_BASE_URL",
    "PIPELINE_PL_BASE_URL", "PIPELINE_PL_SENSORS",
    "PIPELINE_DISABLE_DE", "PIPELINE_DISABLE_NL", "PIPELINE_DISABLE_PL",
    "PIPELINE_PL_ONLY_AUTO"
  )

  test("defaults match the reference Settings dataclass (config.py:9-53)") {
    val c = PipelineConfig.fromEnv(Map.empty)
    // Kafka
    assert(c.kafkaBootstrap == "kafka:9092" && c.kafkaTopic == "airquality.raw")
    assert(c.kafkaSecurityProtocol == "PLAINTEXT")
    assert(c.kafkaSaslMechanism == "" && c.kafkaSaslUsername == "" && c.kafkaSaslPassword == "")
    // loop: 300 s sleep, live API OFF by default (config.py:17 — the
    // .env.example's `true` is an example value, not the default)
    assert(c.sleepSeconds == 300 && !c.liveApi)
    // Postgres
    assert(c.dbHost == "postgres" && c.dbPort == 5432 && c.dbName == "airquality")
    assert(c.dbUser == "airuser" && c.dbPassword == "airpassword" && c.dbSslMode == "")
    // sources
    assert(c.deBaseUrl == "https://www.umweltbundesamt.de/api/air_data/v2")
    assert(c.deStations == Seq("1250")) // "1250".split(",") in the reference
    assert(c.nlBaseUrl == "https://iq.luchtmeetnet.nl/open_api")
    assert(c.plBaseUrl == "https://api.gios.gov.pl/pjp-api/v1/rest")
    // Python's "".split(",") is [""], a quirk not an intent — the engine
    // models "no sensors configured" as empty (documented divergence)
    assert(c.plSensors.isEmpty)
    assert(c.plOnlyAuto) // default TRUE (config.py:45)
    assert(!c.disableDe && !c.disableNl && !c.disablePl)
    // engine knobs from deeper modules
    assert(c.retentionDays == 7 && c.nlRequestLimit == 280)
    assert(c.components == Seq("pm25", "pm10", "no2", "o3"))
  }

  test("every .env.example key round-trips (full enumeration)") {
    val env = Map(
      "KAFKA_BOOTSTRAP" -> "localhost:9092",
      "KAFKA_TOPIC" -> "airquality.raw2",
      "KAFKA_SECURITY_PROTOCOL" -> "SASL_SSL",
      "KAFKA_SASL_MECHANISM" -> "PLAIN",
      "KAFKA_SASL_USERNAME" -> "key",
      "KAFKA_SASL_PASSWORD" -> "secret",
      "PIPELINE_LIVE_API" -> "true",
      "PIPELINE_SLEEP_SECONDS" -> "60",
      "POSTGRES_HOST" -> "db.example",
      "POSTGRES_PORT" -> "6432",
      "POSTGRES_DB" -> "aq",
      "POSTGRES_USER" -> "u",
      "POSTGRES_PASSWORD" -> "p",
      "POSTGRES_SSLMODE" -> "require",
      "PIPELINE_DE_BASE_URL" -> "https://de.example/v2",
      "PIPELINE_DE_STATIONS" -> "1250, 509 ,931",
      "PIPELINE_NL_BASE_URL" -> "https://nl.example/api",
      "PIPELINE_PL_BASE_URL" -> "https://pl.example/rest",
      "PIPELINE_PL_SENSORS" -> "642:no2:114,644:o3:114",
      "PIPELINE_DISABLE_DE" -> "true",
      "PIPELINE_DISABLE_NL" -> "false",
      "PIPELINE_DISABLE_PL" -> "true",
      "PIPELINE_PL_ONLY_AUTO" -> "false"
    )
    // the spec's key list IS .env.example's — no key silently untested
    assert(env.keySet == envExampleKeys.toSet)
    val c = PipelineConfig.fromEnv(env)
    assert(c.kafkaBootstrap == "localhost:9092" && c.kafkaTopic == "airquality.raw2")
    assert(c.kafkaSecurityProtocol == "SASL_SSL" && c.kafkaSaslMechanism == "PLAIN")
    assert(c.kafkaSaslUsername == "key" && c.kafkaSaslPassword == "secret")
    assert(c.liveApi && c.sleepSeconds == 60)
    assert(c.dbHost == "db.example" && c.dbPort == 6432 && c.dbName == "aq")
    assert(c.dbUser == "u" && c.dbPassword == "p" && c.dbSslMode == "require")
    assert(c.deBaseUrl == "https://de.example/v2")
    assert(c.deStations == Seq("1250", "509", "931"))
    assert(c.nlBaseUrl == "https://nl.example/api")
    assert(c.plBaseUrl == "https://pl.example/rest")
    assert(c.plSensors == Seq("642:no2:114", "644:o3:114"))
    assert(c.disableDe && !c.disableNl && c.disablePl)
    assert(!c.plOnlyAuto)
  }

  test("booleans use the reference's STRICT lower()=='true' rule") {
    // config.py parses toggles as `.lower() == "true"` — "1"/"yes"/"on"
    // are all FALSE there, and TRUE only for any-case "true"
    for (v <- Seq("1", "yes", "on", "t", ""))
      assert(!PipelineConfig.fromEnv(Map("PIPELINE_LIVE_API" -> v)).liveApi, s"'$v'")
    for (v <- Seq("true", "TRUE", "True"))
      assert(PipelineConfig.fromEnv(Map("PIPELINE_LIVE_API" -> v)).liveApi, s"'$v'")
    // and a strict-false flips a default-true toggle
    assert(!PipelineConfig.fromEnv(Map("PIPELINE_PL_ONLY_AUTO" -> "no")).plOnlyAuto)
  }

  test("env values parse; CSV splits, trims, lowercases (NL components)") {
    val c = PipelineConfig.fromEnv(Map(
      "PIPELINE_SLEEP_SECONDS" -> "60",
      "NL_COMPONENTS" -> " PM25 , NO2 ,so2",
      "RETENTION_DAYS" -> "30"
    ))
    assert(c.sleepSeconds == 60 && c.retentionDays == 30)
    assert(c.components == Seq("pm25", "no2", "so2"))
  }

  test("malformed values fail open to defaults (engine posture, documented divergence)") {
    val c = PipelineConfig.fromEnv(Map(
      "PIPELINE_SLEEP_SECONDS" -> "not-a-number",
      "POSTGRES_PORT" -> "x",
      "NL_COMPONENTS" -> " , ,",
      "PIPELINE_DE_STATIONS" -> " , "
    ))
    assert(c.sleepSeconds == 300 && c.dbPort == 5432)
    assert(c.components == PipelineConfig().components)
    // an all-blank CSV is "nothing configured" → empty, NOT the default
    // station list (explicitly setting the var clears the default)
    assert(c.deStations.isEmpty)
  }
}
