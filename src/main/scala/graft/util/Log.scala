package graft.util

import java.util.concurrent.CopyOnWriteArrayList

import org.apache.logging.log4j.{Level, LogManager}
import org.apache.logging.log4j.core.config.Configurator
import org.slf4j.{Logger, LoggerFactory}

/** Env-aware logging facade (reference parity:
  * `/root/reference/src/logger.py:6-24` — one setup call that behaves
  * differently in-platform vs locally, then `get_logger(name)` per
  * module).
  *
  * In-platform (cluster) the hosting runtime owns appender/layout
  * config, so [[init]] only raises the engine's level to INFO — the
  * analogue of the reference's Lambda branch (`logger.py:9-10`, set
  * root level, keep the platform handler). Locally it additionally
  * opts the `graft` namespace into INFO console output underneath
  * Spark's default WARN root (`logger.py:12-18`, basicConfig to
  * stdout).
  *
  * Loggers write through slf4j (Spark's log4j2 backend) AND notify
  * registered listeners, so tests can assert on pipeline log lines
  * without scraping appender internals (PipelineSpec does).
  */
object Log {

  /** Marker env var whose presence means "running under the managed
    * platform" — the analogue of the reference's runtime-injected
    * function-name variable (`lambda_handler.py:48`). Anything
    * non-empty counts. */
  val PlatformMarker = "GRAFT_PLATFORM"

  def inPlatform(env: Map[String, String]): Boolean =
    env.get(PlatformMarker).exists(_.nonEmpty)

  /** One-time env-aware setup; idempotent, safe to call per entry
    * point (Pipeline.handle calls it). */
  def init(env: Map[String, String] = sys.env): Unit = synchronized {
    if (inPlatform(env)) {
      Configurator.setLevel("graft", Level.INFO)
    } else {
      Configurator.setLevel("graft", Level.INFO)
      // Local runs keep Spark's console appender; only the engine's
      // namespace is widened (root stays at Spark's WARN default so
      // local output is the pipeline's own lines, not executor chatter).
      if (LogManager.getRootLogger.getLevel == null)
        Configurator.setRootLevel(Level.WARN)
    }
  }

  /** level, logger name, rendered message. */
  type Listener = (String, String, String) => Unit

  private val listeners = new CopyOnWriteArrayList[Listener]()

  /** Register a test/audit listener; close the handle to detach. */
  def addListener(f: Listener): AutoCloseable = {
    listeners.add(f)
    () => { listeners.remove(f); () }
  }

  final class GraftLogger private[Log] (name: String) extends Serializable {
    @transient private lazy val slf: Logger = LoggerFactory.getLogger(name)
    private def emit(level: String, msg: String)(out: String => Unit): Unit = {
      out(msg)
      val it = listeners.iterator()
      while (it.hasNext) it.next()(level, name, msg)
    }
    def info(msg: => String): Unit = emit("INFO", msg)(slf.info)
    def warn(msg: => String): Unit = emit("WARN", msg)(slf.warn)
    def error(msg: => String): Unit = emit("ERROR", msg)(slf.error)
  }

  /** `get_logger(name)` twin (`logger.py:22-24`). */
  def apply(name: String): GraftLogger = new GraftLogger(name)
}
