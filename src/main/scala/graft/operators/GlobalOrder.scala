package graft.operators

import org.apache.logging.log4j.{Level, LogManager}
import org.apache.logging.log4j.core.config.Configurator

/** Explicit opt-in gate for the repo's two DECLARED global-order forms —
  * `SequencePacking.pack` (oracle-friendly whole-corpus packing) and the
  * CDC gap-free `itemID` (strict reference-contract numbering). Both run
  * a partition-less window by design, which is single-task and therefore
  * only valid on bounded inputs; their scale-safe twins
  * (`packSharded` / itemID-off) are the 100 TB paths.
  *
  * Spark logs `WARN WindowExec: No Partition Defined` for every such
  * window. For these two audited call sites the warning is noise that a
  * REAL regression could hide behind (11 repeats in a full test run), so
  * the gate logs the rationale once and then mutes that one logger. Any
  * accidental partition-less window elsewhere is still caught by
  * PlanSpec's no-WindowExec plan pins, which is the stronger check.
  */
object GlobalOrder {

  @volatile private var enabled = false

  /** Record (once) that a declared global-order form is in use and mute
    * WindowExec's partition-less warning. Call from the opt-in paths
    * only — never from a default path. */
  def allow(form: String): Unit = if (!enabled) synchronized {
    if (!enabled) {
      LogManager.getLogger(getClass).info(
        s"global-order form '$form' enabled: partition-less window is " +
          "intentional (bounded input, documented contract); muting " +
          "WindowExec's no-partition warning — scale-safe twins exist " +
          "(packSharded / itemID off)")
      Configurator.setLevel(
        "org.apache.spark.sql.execution.window.WindowExec", Level.ERROR)
      enabled = true
    }
  }
}
