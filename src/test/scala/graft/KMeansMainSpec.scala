package graft

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

/** End-to-end CLI contract (EP1/EP2) + CSV sink round-trip (O1/O15). */
class KMeansMainSpec extends SparkSpec {

  private val base = "/root/reference/script_results/script_3"
  private def tmp(name: String) = s"/tmp/graft-test/$name"

  test("EP1: file-init fit reproduces the reference golden objective") {
    assume(new java.io.File(s"$base/input/points.csv").exists())
    KMeansMain.run(spark, Map(
      "points" -> s"$base/input/points.csv",
      "centroids" -> s"$base/input/centroids.csv",
      "iterations" -> "15",
      "pointsout" -> tmp("pts"), "centroidsout" -> tmp("cents"),
      "objfunout" -> tmp("obj")))
    val objFile = Files.list(Paths.get(tmp("obj"))).iterator.asScala
      .find(_.toString.endsWith(".csv")).get
    val obj = Files.readString(objFile).trim.toDouble
    val golden = 264991.66158851766
    assert(math.abs(obj - golden) / golden < 1e-9)
    // points sink: one headerless CSV file with one row per input point
    val ptsFile = Files.list(Paths.get(tmp("pts"))).iterator.asScala
      .filter(_.toString.endsWith(".csv")).toList
    assert(ptsFile.size == 1)
    assert(Files.lines(ptsFile.head).count() == 100000L)
  }

  test("EP2: seeded random init is reproducible and respects the config") {
    assume(new java.io.File(s"$base/input/points.csv").exists())
    val args = Map(
      "points" -> s"$base/input/points.csv",
      "numcentroids" -> "4", "seed" -> "11",
      "iterations" -> "3", "custconvergence" -> "false")
    val a = KMeansMain.run(spark, args)
    val b = KMeansMain.run(spark, args)
    assert(a.centroids == b.centroids)
    assert(a.iterations == 3)
  }

  test("script_1 k-sweep through the CLI: unique-basin cells hit the golden best to 1e-6") {
    // The reference's objective-vs-k sweep (scripts/script_1.sh) did
    // not preserve its per-run random inits, so only the cells with a
    // UNIQUE optimum basin (k = 1..4 on the blob points — every init
    // converges to the same partition, so the converged SSE is
    // init-independent) are exactly comparable. Those four cells
    // replayed through the real CLI contract (KMeansMain.run with
    // seeded generated init, best of 2 seeds) must reproduce the
    // golden file's best objective within 1e-6 relative — the same
    // band the script_3 replay uses. k ≥ 5 scatters with init noise
    // in the goldens themselves (SweepReplay's artifact records the
    // full-curve ratios).
    val s1 = "/root/reference/script_results/script_1"
    assume(new java.io.File(s"$s1/input/points.csv").exists())
    def goldenBest(k: Int): Double = {
      val src = scala.io.Source.fromFile(s"$s1/results_objfun_$k.csv")
      try src.getLines().drop(1)
        .flatMap(_.split(",").lift(1).map(_.toDouble)).min
      finally src.close()
    }
    (1 to 4).foreach { k =>
      val best = (1 to 2).map { i =>
        val res = KMeansMain.run(spark, Map(
          "points" -> s"$s1/input/points.csv",
          "numcentroids" -> k.toString,
          "seed" -> (1000L * k + i).toString,
          "iterations" -> "30", "custconvergence" -> "false"))
        kmeans.KMeansFit.sse(
          Tables.pointsCsv(spark, s"$s1/input/points.csv")
            .withColumn("pid",
              org.apache.spark.sql.functions.monotonically_increasing_id())
            .select("pid", "x", "y"),
          res.centroids)
      }.min
      val g = goldenBest(k)
      assert(math.abs(best - g) / g < 1e-6,
        s"k=$k: best=$best golden=$g")
    }
  }

  test("objtraceout emits the per-iteration objective matching the reference goldens") {
    assume(new java.io.File(s"$base/input/points.csv").exists())
    KMeansMain.run(spark, Map(
      "points" -> s"$base/input/points.csv",
      "centroids" -> s"$base/input/centroids.csv",
      "iterations" -> "5",
      "pointsout" -> tmp("tr_pts"), "centroidsout" -> tmp("tr_cents"),
      "objfunout" -> tmp("tr_obj"), "objtraceout" -> tmp("tr_trace")))
    val traceFile = Files.list(Paths.get(tmp("tr_trace"))).iterator.asScala
      .find(_.toString.endsWith(".csv")).get
    val rows = Files.readAllLines(traceFile).asScala
      .map(_.split(",")).map(a => a(0).toInt -> a(1).toDouble).toMap
    assert(rows.keySet == (1 to 5).toSet)
    // golden from the reference's script_3 per-iteration results
    def golden(n: Int): Double = {
      val src = scala.io.Source.fromFile(s"$base/results_objfun_$n.csv")
      try src.getLines().drop(1).next().split(",")(1).toDouble
      finally src.close()
    }
    for (n <- Seq(1, 2, 5))
      assert(math.abs(rows(n) - golden(n)) / golden(n) < 1e-9, s"iter=$n")
  }

  test("CLI binary path: main(argv) in a fresh JVM replays all 15 script_3 goldens") {
    assume(new java.io.File(s"$base/input/points.csv").exists())
    // The real user entry point — graft.KMeansMain.main with the
    // reference's own flag syntax — in its OWN JVM (main builds and
    // stops its own SparkSession; running it in-process would stop the
    // suite's shared session). Same classpath + JDK17 module flags as
    // this forked test JVM.
    val addOpens = Seq(
      "java.base/java.lang", "java.base/java.lang.invoke",
      "java.base/java.lang.reflect", "java.base/java.io",
      "java.base/java.net", "java.base/java.nio",
      "java.base/java.util", "java.base/java.util.concurrent",
      "java.base/java.util.concurrent.atomic",
      "java.base/sun.nio.ch", "java.base/sun.nio.cs",
      "java.base/sun.security.action", "java.base/sun.util.calendar"
    ).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
    val cmd = Seq(
      s"${System.getProperty("java.home")}/bin/java", "-Xmx4g",
      "-Dspark.ui.enabled=false", "-cp", System.getProperty("java.class.path")) ++
      addOpens ++ Seq(
      "graft.KMeansMain",
      "-points", s"$base/input/points.csv",
      "-centroids", s"$base/input/centroids.csv",
      "-iterations", "15",
      "-pointsout", tmp("cli_pts"), "-centroidsout", tmp("cli_cents"),
      "-objfunout", tmp("cli_obj"), "-objtraceout", tmp("cli_trace"))
    val pb = new ProcessBuilder(cmd.asJava).redirectErrorStream(true)
    val proc = pb.start()
    val out = new String(proc.getInputStream.readAllBytes(), "UTF-8")
    val exit = proc.waitFor()
    assert(exit == 0, s"CLI exited $exit:\n${out.takeRight(2000)}")
    val traceFile = Files.list(Paths.get(tmp("cli_trace"))).iterator.asScala
      .find(_.toString.endsWith(".csv")).get
    val rows = Files.readAllLines(traceFile).asScala
      .map(_.split(",")).map(a => a(0).toInt -> a(1).toDouble).toMap
    assert(rows.keySet == (1 to 15).toSet)
    def golden(n: Int): Double = {
      val src = scala.io.Source.fromFile(s"$base/results_objfun_$n.csv")
      try src.getLines().drop(1).next().split(",")(1).toDouble
      finally src.close()
    }
    for (n <- 1 to 15)
      assert(math.abs(rows(n) - golden(n)) / golden(n) < 1e-6, s"iter=$n")
  }

  test("CSV round-trip: write headerless, read back with positional schema") {
    import spark.implicits._
    val cents = Seq(kmeans.Cent(0, 1.5, -2.5), kmeans.Cent(1, 3.25, 4.75))
    Tables.writeCsvSingle(Tables.centroidsDF(spark, cents), tmp("roundtrip"))
    // reference reader skips the first line (ignoreFirstLine) — our
    // writer emits no header, so prepend one like the notebook does
    val files = Files.list(Paths.get(tmp("roundtrip"))).iterator.asScala
      .filter(_.toString.endsWith(".csv")).toList
    assert(files.size == 1)
    val withHeader = tmp("roundtrip_hdr.csv")
    Files.writeString(Paths.get(withHeader),
      "Cluster,X,Y\n" + Files.readString(files.head))
    val back = Tables.centroidsCsv(spark, withHeader).collect()
      .map(r => kmeans.Cent(r.getInt(0), r.getDouble(1), r.getDouble(2)))
      .toSeq.sortBy(_.cid)
    assert(back == cents)
  }

  test("arg parser handles the reference flag set") {
    val p = KMeansMain.parseArgs(Array(
      "-points", "p.csv", "-numcentroids", "8", "-epsilon", "0.5"))
    assert(p == Map("points" -> "p.csv", "numcentroids" -> "8", "epsilon" -> "0.5"))
  }
}
