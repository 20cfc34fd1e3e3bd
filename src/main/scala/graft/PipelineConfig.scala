package graft

/** The reference's runtime configuration surface (reference
  * app/config.py:1-58) mapped onto the engine's operator parameters.
  * Values parse from an env map with the reference's defaults and
  * CSV-splitting convention (app/config.py:30, 41 — F5 in SURVEY §2.8).
  *
  * | field | reference env var | consumed by |
  * |---|---|---|
  * | sleepSeconds | PIPELINE_SLEEP_SECONDS (default 300, config.py:16) | ProducerLoop trigger (T1) |
  * | liveApi | PIPELINE_LIVE_API | source selection (S1-S8) |
  * | plOnlyAuto | PL_ONLY_AUTO (config.py:44) | Normalize.onlyAutomatic (P7) |
  * | components | NL components CSV (config.py:30) | pollutant allowlist (P6) |
  * | retentionDays | retention_days (housekeeping.py:6) | Jobs.housekeeping |
  * | nlRequestLimit | NL_REQUEST_LIMIT (main.py:416) | connector budget (L2) |
  */
case class PipelineConfig(
    sleepSeconds: Int = 300,
    liveApi: Boolean = true,
    plOnlyAuto: Boolean = false,
    components: Seq[String] = Seq("pm25", "pm10", "no2", "o3"),
    retentionDays: Int = 7,
    nlRequestLimit: Int = 280
)

object PipelineConfig {

  private def bool(s: String): Boolean =
    Seq("1", "true", "yes", "on").contains(s.trim.toLowerCase)

  /** Parse from an env map, falling back to the reference's defaults on
    * missing or malformed values (the reference's fail-open posture).
    */
  def fromEnv(env: Map[String, String]): PipelineConfig = {
    val d = PipelineConfig()
    def int(k: String, dflt: Int) =
      env.get(k).flatMap(v => scala.util.Try(v.trim.toInt).toOption).getOrElse(dflt)
    PipelineConfig(
      sleepSeconds = int("PIPELINE_SLEEP_SECONDS", d.sleepSeconds),
      liveApi = env.get("PIPELINE_LIVE_API").map(bool).getOrElse(d.liveApi),
      plOnlyAuto = env.get("PL_ONLY_AUTO").map(bool).getOrElse(d.plOnlyAuto),
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
