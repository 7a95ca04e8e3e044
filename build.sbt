ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "wikitrenderspark"
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
// The round driver parses ONE bare JSON line from `runMain graft.Bench`
// stdout. sbt's default LoggedOutput prefixes every forked-process line
// with "[info] ", which broke the driver's parse in rounds 1-9
// (BENCH_r0*.json parsed:null). StdoutOutput pipes the child's stdout
// straight through, unprefixed.
Compile / run / outputStrategy := Some(StdoutOutput) // runMain shares it
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
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
  // HotSpot refuses to JIT-compile methods over 8000 bytecode
  // (DontCompileHugeMethods), while Spark only falls back from
  // whole-stage codegen above spark.sql.codegen.hugeMethodLimit=65535 —
  // so a generated stage in the 8000..65535 window runs in the bytecode
  // INTERPRETER forever. Several literal-book stages live exactly there
  // (measured at sf0.1: emb_ivf_kmeans_topk 1.77 -> 0.98 s,
  // doc_dup_spans 2.10 -> 1.60 s, with no regressions elsewhere —
  // lowering hugeMethodLimit instead regressed HOF-heavy stages like
  // doc_gopher_quality 8x by forcing interpreted-expression fallback).
  // On a cluster the same flag belongs in
  // spark.executor.extraJavaOptions; it changes no plan and no result.
  "-XX:-DontCompileHugeMethods",
  // STATIC SQL conf (read once at CodeGenerator class-init, so it must
  // arrive as a JVM property, not a session conf): the generated-class
  // cache holds only 100 entries by default, and a 177-query two-pass
  // suite compiles well over a thousand distinct stages — the cache
  // thrashed and EVERY pass recompiled EVERY stage. Raising it cut the
  // full sf0.1 bench 146.7 -> 121.3 s (−17%) with every per-query move
  // negative or noise-level; memory cost is generated classes only.
  // Same knob, same reasoning on a long-lived production driver.
  "-Dspark.sql.codegen.cache.maxEntries=10000",
)
