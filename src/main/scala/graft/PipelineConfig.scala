package graft

/** The reference's FULL runtime configuration surface (reference
  * app/config.py:1-58 — the `Settings` dataclass — and
  * `.env.example`) mapped onto the engine's operator parameters.
  * Every key of the reference's `.env.example` round-trips through
  * [[PipelineConfig.fromEnv]] with the reference's own default and
  * parse rule (PipelineConfigSpec enumerates the complete key set).
  *
  * Parse-rule fidelity (config.py):
  *  - booleans are the reference's STRICT `lower() == "true"`
  *    (config.py:17,45,48-53) — "1"/"yes"/"on" are falsy there, so
  *    they are falsy here;
  *  - ints are `int(...)`; the reference would CRASH on a malformed
  *    int at import time — this engine fails OPEN to the default
  *    instead (the one deliberate divergence, documented in the spec:
  *    a bad env var must not kill a 1000-executor job at submit);
  *  - CSV lists split on "," (config.py:30,41). Python's `"".split(",")`
  *    yields `[""]`; the engine models the INTENT (no entries → empty
  *    list) and the spec pins that divergence explicitly.
  *
  * | field group | reference env vars | consumed by |
  * |---|---|---|
  * | Kafka frame/security | KAFKA_BOOTSTRAP/TOPIC/SECURITY_PROTOCOL/SASL_* | streaming/ProducerLoop (S11 frame contract) |
  * | Producer loop | PIPELINE_SLEEP_SECONDS (300), PIPELINE_LIVE_API | T1 trigger, S1-S8 source selection |
  * | Postgres catalog | POSTGRES_HOST/PORT/DB/USER/PASSWORD/SSLMODE | S9/S10/S12 (parquet-snapshot substitute, SURVEY §7.2.5) |
  * | DE source | PIPELINE_DE_BASE_URL, PIPELINE_DE_STATIONS | S1/S4 |
  * | NL source | PIPELINE_NL_BASE_URL | S2/S5 |
  * | PL source | PIPELINE_PL_BASE_URL, PIPELINE_PL_SENSORS, PIPELINE_PL_ONLY_AUTO | S3/S6, P7 predicate |
  * | Toggles | PIPELINE_DISABLE_DE/NL/PL | source selection |
  * | Engine knobs | NL_COMPONENTS (P6 allowlist), RETENTION_DAYS (housekeeping.py:6), NL_REQUEST_LIMIT (main.py:416) | Normalize, Jobs, L2 budget |
  */
case class PipelineConfig(
    // Kafka (reference config.py:9-15)
    kafkaBootstrap: String = "kafka:9092",
    kafkaTopic: String = "airquality.raw",
    kafkaSecurityProtocol: String = "PLAINTEXT",
    kafkaSaslMechanism: String = "",
    kafkaSaslUsername: String = "",
    kafkaSaslPassword: String = "",
    // producer loop (config.py:16-17)
    sleepSeconds: Int = 300,
    liveApi: Boolean = false,
    // Postgres catalog (config.py:19-24)
    dbHost: String = "postgres",
    dbPort: Int = 5432,
    dbName: String = "airquality",
    dbUser: String = "airuser",
    dbPassword: String = "airpassword",
    dbSslMode: String = "",
    // sources (config.py:26-43)
    deBaseUrl: String = "https://www.umweltbundesamt.de/api/air_data/v2",
    deStations: Seq[String] = Seq("1250"),
    nlBaseUrl: String = "https://iq.luchtmeetnet.nl/open_api",
    plBaseUrl: String = "https://api.gios.gov.pl/pjp-api/v1/rest",
    plSensors: Seq[String] = Seq.empty,
    plOnlyAuto: Boolean = true,
    // toggles (config.py:46-53)
    disableDe: Boolean = false,
    disableNl: Boolean = false,
    disablePl: Boolean = false,
    // engine knobs surfaced from deeper reference modules
    components: Seq[String] = Seq("pm25", "pm10", "no2", "o3"),
    retentionDays: Int = 7,
    nlRequestLimit: Int = 280
)

object PipelineConfig {

  /** The reference's strict boolean rule: config.py parses every
    * toggle as `os.getenv(...).lower() == "true"`. */
  private def refBool(s: String): Boolean = s.trim.toLowerCase == "true"

  /** Parse from an env map, falling back to the reference's defaults on
    * missing or malformed values (fail-open; see class scaladoc).
    */
  def fromEnv(env: Map[String, String]): PipelineConfig = {
    val d = PipelineConfig()
    def str(k: String, dflt: String) = env.getOrElse(k, dflt)
    def int(k: String, dflt: Int) =
      env.get(k).flatMap(v => scala.util.Try(v.trim.toInt).toOption).getOrElse(dflt)
    def boolOr(k: String, dflt: Boolean) = env.get(k).map(refBool).getOrElse(dflt)
    def csv(k: String, dflt: Seq[String]) = env.get(k) match {
      case None => dflt
      case Some(v) => v.split(",").map(_.trim).filter(_.nonEmpty).toSeq
    }
    PipelineConfig(
      kafkaBootstrap = str("KAFKA_BOOTSTRAP", d.kafkaBootstrap),
      kafkaTopic = str("KAFKA_TOPIC", d.kafkaTopic),
      kafkaSecurityProtocol = str("KAFKA_SECURITY_PROTOCOL", d.kafkaSecurityProtocol),
      kafkaSaslMechanism = str("KAFKA_SASL_MECHANISM", d.kafkaSaslMechanism),
      kafkaSaslUsername = str("KAFKA_SASL_USERNAME", d.kafkaSaslUsername),
      kafkaSaslPassword = str("KAFKA_SASL_PASSWORD", d.kafkaSaslPassword),
      sleepSeconds = int("PIPELINE_SLEEP_SECONDS", d.sleepSeconds),
      liveApi = boolOr("PIPELINE_LIVE_API", d.liveApi),
      dbHost = str("POSTGRES_HOST", d.dbHost),
      dbPort = int("POSTGRES_PORT", d.dbPort),
      dbName = str("POSTGRES_DB", d.dbName),
      dbUser = str("POSTGRES_USER", d.dbUser),
      dbPassword = str("POSTGRES_PASSWORD", d.dbPassword),
      dbSslMode = str("POSTGRES_SSLMODE", d.dbSslMode),
      deBaseUrl = str("PIPELINE_DE_BASE_URL", d.deBaseUrl),
      deStations = csv("PIPELINE_DE_STATIONS", d.deStations),
      nlBaseUrl = str("PIPELINE_NL_BASE_URL", d.nlBaseUrl),
      plBaseUrl = str("PIPELINE_PL_BASE_URL", d.plBaseUrl),
      plSensors = csv("PIPELINE_PL_SENSORS", d.plSensors),
      plOnlyAuto = boolOr("PIPELINE_PL_ONLY_AUTO", d.plOnlyAuto),
      disableDe = boolOr("PIPELINE_DISABLE_DE", d.disableDe),
      disableNl = boolOr("PIPELINE_DISABLE_NL", d.disableNl),
      disablePl = boolOr("PIPELINE_DISABLE_PL", d.disablePl),
      components = env
        .get("NL_COMPONENTS")
        .map(_.split(",").map(_.trim.toLowerCase).filter(_.nonEmpty).toSeq)
        .filter(_.nonEmpty)
        .getOrElse(d.components),
      retentionDays = int("RETENTION_DAYS", d.retentionDays),
      nlRequestLimit = int("NL_REQUEST_LIMIT", d.nlRequestLimit)
    )
  }
}
