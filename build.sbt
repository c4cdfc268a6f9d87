ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "traderjoeetlspark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
Test / fork := true
run / fork := true
// Pass the forked process's stdout/stderr through raw instead of routing
// them through sbt's logger: the driver parses Bench's single JSON line
// from stdout, and the default LoggedOutput "[info] "-prefixes it.
run / outputStrategy := Some(StdoutOutput)
// Spark 4.x on JDK 17 needs these when SparkSession is created outside
// spark-submit (which normally injects them). Matches
// org.apache.spark.launcher.JavaModuleOptions.defaultModuleOptions().
val jdk17AddOpens = Seq(
  "java.base/java.lang", "java.base/java.lang.invoke",
  "java.base/java.lang.reflect", "java.base/java.io",
  "java.base/java.net", "java.base/java.nio",
  "java.base/java.util", "java.base/java.util.concurrent",
  "java.base/java.util.concurrent.atomic",
  "java.base/sun.nio.ch", "java.base/sun.nio.cs",
  "java.base/sun.security.action", "java.base/sun.util.calendar",
).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
// Pin -Xms well below a large -Xmx: on a ~96g max heap (the driver
// harness environment) G1's ergonomics size regions/young-gen off the
// huge maximum and the same bench suite measured 11.1s vs 8.6s on the
// GC-sensitive subset with default Xms vs Xms8g — reproducibly ~20-25%
// slower for a 60MB dataset that never needs the big heap. Capped at
// Xmx for small-heap runs.
val driverMem = sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")
val initialHeap: String = {
  val m = "(?i)^(\\d+)([gmk]?)$".r
  driverMem.trim match {
    case m(n, u) =>
      // the raw string feeds -Xmx, where a bare number means BYTES —
      // parse the unitless case the same way or -Xms could exceed -Xmx
      val mb = u.toLowerCase match {
        case "g" => n.toLong * 1024
        case "m" => n.toLong
        case "k" => n.toLong / 1024
        case ""  => n.toLong / (1024L * 1024L)
      }
      if (mb >= 8192) "8g" else driverMem
    case _ => "1g" // unparseable SPARK_DRIVER_MEM: fall back to a safe floor
  }
}
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Xmx$driverMem",
  s"-Xms$initialHeap",
) ++ sys.env.get("SPARK_GRAFT_JVM_EXTRA").toSeq.flatMap(_.split(" ").filter(_.nonEmpty))
