package graft.cdc

import org.scalatest.funsuite.AnyFunSuite
import scala.sys.process._

/** The Helm chart's committed goldens (deploy/chart/rendered/) must be
  * deployable artifacts that actually drive the engine: right document
  * inventory per mode, shard identity wired from the StatefulSet into
  * the ${ENV:}$ placeholders, and the embedded config loading through
  * Config.load exactly as graft.cdc.Main would at pod start. Where
  * python3 is available the goldens are also re-rendered from the
  * chart sources and diffed, so they can't go stale.
  */
class DeployChartSpec extends AnyFunSuite {

  private def read(p: String): String =
    new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(p)), "UTF-8")

  /** (kind, name) inventory of a multi-doc manifest. */
  private def docs(manifest: String): Seq[(String, String, String)] =
    manifest.split("(?m)^---$").toSeq.filter(_.trim.nonEmpty).map { doc =>
      def field(re: String) =
        re.r.findFirstMatchIn(doc).map(_.group(1)).getOrElse("")
      (field("(?m)^kind: (\\S+)"), field("(?m)^  name: (\\S+)"), doc)
    }

  private lazy val default = docs(read("deploy/chart/rendered/default.yaml"))
  private lazy val ha = docs(read("deploy/chart/rendered/ha.yaml"))

  test("default mode renders the primary-only inventory") {
    assert(default.map(d => (d._1, d._2)).sorted == Seq(
      ("ConfigMap", "cdc-graft-config"),
      ("PodDisruptionBudget", "cdc-graft"),
      ("Service", "cdc-graft"),
      ("Service", "cdc-graft-headless"),
      ("ServiceAccount", "cdc-graft"),
      ("StatefulSet", "cdc-graft")).sorted)
  }

  test("highAvailabilityMode adds the standby set, services and PDB") {
    val names = ha.map(d => (d._1, d._2))
    val added = names.toSet -- default.map(d => (d._1, d._2)).toSet
    assert(added == Set(
      ("StatefulSet", "cdc-graft-standby"),
      ("Service", "cdc-graft-standby"),
      ("Service", "cdc-graft-headless-standby"),
      ("PodDisruptionBudget", "cdc-graft-standby")))
  }

  test("statefulsets inject shard identity and role; replicas match count") {
    for ((mode, name, role) <- Seq((ha, "cdc-graft", "primary"),
        (ha, "cdc-graft-standby", "standby"))) {
      val sts = mode.find(d => d._1 == "StatefulSet" && d._2 == name).get._3
      assert(sts.contains("metadata.labels['apps.kubernetes.io/pod-index']"),
        s"$name: GRAFT_SHARD_INDEX must come from the pod-index label")
      assert(sts.contains("name: GRAFT_SHARD_INDEX"))
      assert("(?m)^  replicas: 3$".r.findFirstIn(sts).nonEmpty)
      // GRAFT_SHARD_COUNT must equal the rendered replica count
      assert("name: GRAFT_SHARD_COUNT\\s+value: \"3\"".r
        .findFirstIn(sts).nonEmpty)
      assert(s"""name: GRAFT_ROLE\\s+value: $role""".r
        .findFirstIn(sts).nonEmpty)
      assert(sts.contains("--class") && sts.contains("graft.cdc.Main"))
      // probes hit the ObservabilityServer surface
      assert(sts.contains("path: /healthz"))
      assert(sts.contains("path: /api/v1/server"))
    }
  }

  test("standby selector is disjoint from primary (component label)") {
    val primary = ha.find(d => d._1 == "Service" && d._2 == "cdc-graft").get._3
    val standby =
      ha.find(d => d._1 == "Service" && d._2 == "cdc-graft-standby").get._3
    assert(primary.contains("app.kubernetes.io/component: primary"))
    assert(standby.contains("app.kubernetes.io/component: standby"))
  }

  test("the rendered configmap loads through Config.load with pod env") {
    val cm = ha.find(_._1 == "ConfigMap").get._3
    val lines = cm.linesIterator.toSeq
    val start = lines.indexWhere(_.trim == "config.yaml: |")
    require(start >= 0, "chart configmap must embed config.yaml")
    val yaml = lines.drop(start + 1)
      .takeWhile(l => l.trim.isEmpty || l.startsWith("    "))
      .map(l => if (l.length >= 4) l.substring(4) else l)
      .mkString("\n")
    val f = java.nio.file.Files.createTempFile("graft-chart", ".yaml")
    java.nio.file.Files.writeString(f, yaml)
    val cfg = Config.load(f.toString, Map(
      "GRAFT_SHARD_INDEX" -> "1",
      "GRAFT_SHARD_COUNT" -> "3",
      "MYSQL_HOST" -> "db.example",
      "MYSQL_USER" -> "repl",
      "MYSQL_PASSWORD" -> "pw",
      "SINK_URL" -> "http://sink/api/v1/data"))
    assert(cfg.serverId == "graft-1")
    assert(cfg.shardingEnabled && cfg.shardCount == 3 && cfg.shardIndex == 1)
    assert(cfg.sourceHost == "db.example")
    assert(cfg.routes.nonEmpty && cfg.connectors.nonEmpty)
  }

  test("goldens match a fresh render of the chart sources") {
    val py = Seq("bash", "-lc", "command -v python3 >/dev/null && " +
      "python3 -c 'import yaml' >/dev/null 2>&1 && echo ok").!!
    assume(py.trim == "ok", "python3+pyyaml unavailable; skipping")
    def render(extra: String) = {
      // round-trip through a file: .!! decodes with the platform
      // charset, which mangles the chart comments' UTF-8
      val out = java.nio.file.Files.createTempFile("chart-render", ".yaml")
      val rc = Seq("bash", "-lc", "python3 tools/render_chart.py " +
        s"deploy/chart/graft --release cdc $extra > $out").!
      assert(rc == 0, "render_chart.py failed")
      read(out.toString)
    }
    assert(render("") == read("deploy/chart/rendered/default.yaml"))
    assert(render("--set highAvailabilityMode.enabled=true") ==
      read("deploy/chart/rendered/ha.yaml"))
  }
}
