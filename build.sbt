ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "sqlservercdctokafkaspark"

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

// ---- contrib: the real-Kafka producer adapter --------------------------
// No kafka-clients jar exists in this zero-egress environment, so the
// adapter compiles against `kafka-shim`: a clean-room, compile-only
// facade of the public kafka-clients API subset it uses (signatures from
// the published Javadoc). The shim plays the role of a provided-scope
// kafka-clients dependency: it is on the compile/test classpath here,
// and a deployment ships the adapter jar next to the REAL kafka-clients
// jar (never the shim — its entry points throw at runtime by design).
lazy val kafkaShim = (project in file("contrib/kafka-shim"))
  .settings(name := "graft-kafka-shim")

lazy val kafkaProducer = (project in file("contrib/kafka-producer"))
  .dependsOn(root, kafkaShim)
  .settings(
    name := "graft-kafka-producer",
    // Spark jars: the adapter implements graft.streaming.CdcPipeline's
    // RecordProducer seam, whose enclosing object references Spark types.
    unmanagedBase := file("/opt/spark/jars"),
    libraryDependencies +=
      "org.scalatest" %% "scalatest" % "3.2.19" % Test,
    // The integration spec drives the adapter through a full Spark
    // pipeline against the in-JVM broker model, so tests fork with the
    // same JDK-17 module opens as the root project.
    Test / fork := true,
    Test / javaOptions ++= jdk17AddOpens ++ Seq(
      "-Dfile.encoding=UTF-8",
      "-Dspark.ui.enabled=false",
      "-Dspark.sql.session.timeZone=UTC",
      "-Xmx4g",
    ),
  )

lazy val root = (project in file("."))

// Root `sbt test` also compiles + contract-tests the adapter, WITHOUT
// aggregation (aggregation would broadcast `runMain graft.Verify/Bench`
// — the external driver's entry points — into subprojects that have no
// such mains).
Test / test := (Test / test).dependsOn(kafkaProducer / Test / test).value
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
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dfile.encoding=UTF-8",
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
)
