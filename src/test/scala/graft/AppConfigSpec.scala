package graft

import java.time.LocalDate

import org.scalatest.funsuite.AnyFunSuite

import graft.ingest.AppConfig
import graft.sink.DbConfig
import graft.util.Log

/** Config/secrets resolution (reference parity:
  * `/root/reference/src/lambda_handler.py:15-66`): required-env
  * errors, platform-vs-local DB credential switch, secret-JSON
  * parsing, and the E5 default-date feed into Pipeline.Config. */
class AppConfigSpec extends AnyFunSuite {

  private val storageEnv = Map(
    "DATA_ROOT" -> "file:///tmp/graft-root/",
    "DATA_PREFIX" -> "incoming/consumption",
    "CHECKPOINT_KEY" -> "state/checkpoint",
    "MISSING_DATES_KEY" -> "state/missing",
    "DEFAULT_DATE" -> "2025_04_30")

  private val localDbEnv = Map(
    "DB_NAME" -> "consumption", "DB_USER" -> "ingest",
    "DB_PASSWORD" -> "pw-local", "DB_HOST" -> "localhost", "DB_PORT" -> "5432")

  private val secretJson =
    """{"DB_NAME":"consumption","DB_USER":"svc","DB_PASS":"pw-secret",
      |"DB_HOST":"db.internal","DB_PORT":"5433"}""".stripMargin

  test("local mode: DB credentials come from individual env vars") {
    val r = AppConfig.resolve(storageEnv ++ localDbEnv,
      fetchSecret = _ => fail("secret fetcher must not be called locally"),
      today = LocalDate.parse("2025-05-04"))
    assert(!r.inPlatform)
    assert(r.db == DbConfig("consumption", "ingest", "pw-local", "localhost", 5432))
  }

  test("platform mode: DB credentials come from the secret JSON") {
    var fetched: Option[String] = None
    val env = storageEnv ++ localDbEnv ++
      Map(Log.PlatformMarker -> "cluster-7", "SECRET_NAME" -> "prod/db")
    val r = AppConfig.resolve(env,
      fetchSecret = { n => fetched = Some(n); secretJson },
      today = LocalDate.parse("2025-05-04"))
    assert(r.inPlatform)
    assert(fetched.contains("prod/db"))
    // secret wins over the env vars even though both are present
    assert(r.db == DbConfig("consumption", "svc", "pw-secret", "db.internal", 5433))
  }

  test("storage env maps onto Pipeline.Config; E5 default date flows through") {
    val r = AppConfig.resolve(storageEnv ++ localDbEnv,
      today = LocalDate.parse("2025-05-04"))
    val p = r.pipeline
    assert(p.prefix == "file:///tmp/graft-root/incoming/consumption")
    assert(p.checkpointDir == "file:///tmp/graft-root/state/checkpoint")
    assert(p.registryDir == "file:///tmp/graft-root/state/missing")
    assert(p.targetDir == "file:///tmp/graft-root/table") // TARGET_KEY default
    assert(p.defaultDate == "2025_04_30")
    assert(p.today == LocalDate.parse("2025-05-04"))
  }

  test("missing required key names the key (reference KeyError semantics)") {
    val e = intercept[AppConfig.ConfigError] {
      AppConfig.resolve((storageEnv - "CHECKPOINT_KEY") ++ localDbEnv)
    }
    assert(e.key == "CHECKPOINT_KEY")
    val e2 = intercept[AppConfig.ConfigError] {
      AppConfig.resolve(storageEnv ++ (localDbEnv - "DB_PASSWORD"))
    }
    assert(e2.key == "DB_PASSWORD")
  }

  test("secret parsing errors: malformed JSON, missing field, bad port") {
    assert(intercept[AppConfig.ConfigError](
      AppConfig.parseSecret("not json")).key == "SECRET")
    assert(intercept[AppConfig.ConfigError](
      AppConfig.parseSecret("""{"DB_NAME":"x"}""")).key == "DB_USER")
    assert(intercept[AppConfig.ConfigError](
      AppConfig.parseSecret(secretJson.replace("5433", "not-a-port"))).key == "DB_PORT")
  }

  test("DbConfig renders a JDBC URL and masks the password in toString") {
    val db = DbConfig("consumption", "svc", "hunter2", "db.internal", 5433)
    assert(db.jdbcUrl == "jdbc:postgresql://db.internal:5433/consumption")
    assert(!db.toString.contains("hunter2"))
  }
}
