ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "pulfasausagefactoryspark"
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
// The driver machine-parses Bench's one-line JSON metric from this
// process's stdout tail. sbt's default forked-output strategy routes the
// child's stdout through the sbt logger, which prefixes every line with
// "[info] " — that prefix is why BENCH_r06/r07 committed with
// parsed:null (round-6 and round-7 advice). StdoutOutput makes the
// forked JVM inherit the real stdout/stderr, so Bench's bare JSON line
// reaches the capture unwrapped.
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
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  // 24g default: local[32] runs 32 concurrent tasks in ONE JVM; at 8g the
  // payload-heavy doc-assembly queries (collect_list of rendered XML) ran
  // GC-bound once a few dozen queries' garbage accumulated (the r2
  // driver-vs-local[8] 3× gap). The machine has 128 GiB; a real 32-core
  // executor would get far more than 8g.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "24g")}",
  // -Xms == -Xmx (round 10): the driver's q52 divergence reproduced at
  // its 89g heap — single reps read 20-100x task CPU with ZERO gc time
  // and ZERO new codegen classes (profiles/q52_r10_89g.jsonl). With the
  // default 2g initial heap, ParallelGC grows toward 89g incrementally
  // and adaptive sizing keeps committing/uncommitting tens of GB as it
  // resizes generations; the page-commit + zeroing churn lands in TASK-
  // thread allocation paths (mutator CPU, invisible to GC time). Pinning
  // the initial heap to the max removes the resize churn: 8/8 steady
  // reps flat at 15-18 CPU-s in both pinned runs, where the unpinned
  // baseline inflated 3 of 8 reps (up to 476 CPU-s). A real executor JVM
  // is provisioned -Xms == -Xmx for exactly this reason.
  s"-Xms${sys.env.getOrElse("SPARK_DRIVER_MEM", "24g")}",
  // ...and touch it at JVM init, not lazily: -Xms commits address space
  // but Linux still zero-fills each page on FIRST TOUCH, which lands in
  // whichever task threads allocate first — measured on a fresh 89g JVM
  // as q52 warm 45.3 s/548 CPU-s vs 14.5 s/97 with PreTouch (steady1
  // 37.9 -> 6.0 s; profiles/q52_r10_89g.jsonl). One bench session is one
  // JVM, so the one-time parallel pre-touch at startup replaces a
  // 20-30 s penalty inside the first heavy query's measured window.
  "-XX:+AlwaysPreTouch",
  // A 135-plan bench session emits thousands of generated classes; the
  // JDK-17 default 240 MB reserved code cache can fill mid-session, at
  // which point the JIT flushes/stops compiling and hot call sites run
  // deoptimized — consistent with the intermittent ~10x single-rep CPU
  // inflation documented in BENCH_NOTES (round 6: mechanism JVM-internal,
  // single-query A/Bs too small to reproduce). Reserving 2g is virtual
  // address space only; it costs nothing when unused (Q52Profile now
  // records per-rep occupancy — codeCacheMB — so a fill shows itself).
  "-XX:ReservedCodeCacheSize=2g",
  // Round 12: the residual intermittent inflation — one random query per
  // long session at ~10x task CPU with ZERO gc delta, ~zero load, and no
  // new codegen classes (r12 run2: q09 task 2->21 s, q149 0.6->7.2 s;
  // the SAME queries flat in run1 and in isolation, while run1 instead
  // drew q101/q102) — matches HotSpot's per-method recompilation cutoff:
  // a generated method that deoptimizes repeatedly (profile-polluted
  // branches across 150 different plans hitting shared runtime helpers)
  // gets marked not-compilable and runs INTERPRETED for the rest of the
  // session. The cutoffs exist to stop deopt loops, not to save memory;
  // -1 disables them so a hot method can always recompile. Product
  // flags, JDK 17.
  "-XX:PerMethodRecompilationCutoff=-1",
  "-XX:PerBytecodeRecompilationCutoff=-1",
  // Round-8 q52 root cause (profiles/q52_r8_{inbench,g1_cleanblocks,
  // parallelgc}.jsonl): under the default G1, a long-lived session that
  // has already run the other 130 registered plans inflates the
  // doc-assembly render stage 3-10x — steady reps 11-20 s wall with
  // 36-210 CPU-s and 4-5 s of GC per rep, where a fresh session runs the
  // same plan at 5-7 s / 15-22 CPU-s. Unpersisting every leftover block
  // did NOT fix it (g1_cleanblocks record), so it is G1 itself — mutator-
  // side refinement/allocation-path work plus fragmentation full GCs
  // against the 131-plan session's churned heap. ParallelGC (the classic
  // batch-throughput collector: compacting full GCs, bump-pointer eden,
  // no region bookkeeping) removes the entire effect under identical
  // preload: steady 5.0-9.9 s wall, 11-24 CPU-s. Latency pauses don't
  // matter in a batch executor, so this is the right collector for the
  // bench AND the honest analog of a tuned production executor JVM.
  "-XX:+UseParallelGC",
) ++ sys.env.get("SPARK_GRAFT_EXTRA_JVMOPTS").toSeq.flatMap(_.split(" ").filter(_.nonEmpty))
