package graft.tools

/** Sanity probe for the fork-free local FS wiring: prints the resolved
  * `file://` FileSystem class and times getFileStatus/create loops,
  * with the host-wide fork counter sampled around each loop. */
object FsCheck {
  private def forks(): Long =
    scala.io.Source.fromFile("/proc/stat").getLines()
      .find(_.startsWith("processes")).map(_.split("\\s+")(1).toLong).getOrElse(-1L)

  def main(args: Array[String]): Unit = {
    val spark = graft.Sessions.local("fscheck", 4)
    val hconf = spark.sparkContext.hadoopConfiguration
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI("file:///"), hconf)
    println(s"FS class: ${fs.getClass.getName}")
    val dir = java.nio.file.Files.createTempDirectory("fscheck_")
    val f = dir.resolve("probe.txt")
    java.nio.file.Files.write(f, "x".getBytes)
    val p = new org.apache.hadoop.fs.Path(f.toString)
    var t0 = System.nanoTime(); var f0 = forks()
    (1 to 2000).foreach(_ => fs.getFileStatus(p))
    println(f"2000 getFileStatus: ${(System.nanoTime()-t0)/1e6}%.1f ms, forks=${forks()-f0}")
    t0 = System.nanoTime(); f0 = forks()
    (1 to 200).foreach { i =>
      val out = fs.create(new org.apache.hadoop.fs.Path(dir.resolve(s"c$i").toString), true)
      out.write(42); out.close()
    }
    println(f"200 create+close: ${(System.nanoTime()-t0)/1e6}%.1f ms, forks=${forks()-f0}")
    // FileContext path (streaming checkpoint manager)
    val fc = org.apache.hadoop.fs.FileContext.getFileContext(
      new java.net.URI("file:///"), hconf)
    println(s"AbstractFileSystem class: ${fc.getDefaultFileSystem.getClass.getName}")
    t0 = System.nanoTime(); f0 = forks()
    (1 to 500).foreach(_ => fc.getFileStatus(p))
    println(f"500 fc.getFileStatus: ${(System.nanoTime()-t0)/1e6}%.1f ms, forks=${forks()-f0}")
    // A/B against the STOCK (forking) classes in the same JVM/host
    val stockRaw = new org.apache.hadoop.fs.RawLocalFileSystem
    stockRaw.initialize(new java.net.URI("file:///"), hconf)
    val stock = new org.apache.hadoop.fs.LocalFileSystem(stockRaw)
    stock.initialize(new java.net.URI("file:///"), hconf)
    println(s"stock FS class: ${stock.getClass.getName} / raw ${stockRaw.getClass.getName}")
    t0 = System.nanoTime(); f0 = forks()
    (1 to 2000).foreach(_ => stock.getFileStatus(p))
    println(f"STOCK 2000 getFileStatus: ${(System.nanoTime()-t0)/1e6}%.1f ms, forks=${forks()-f0}")
    t0 = System.nanoTime(); f0 = forks()
    (1 to 200).foreach { i =>
      val out = stock.create(new org.apache.hadoop.fs.Path(dir.resolve(s"s$i").toString), true)
      out.write(42); out.close()
    }
    println(f"STOCK 200 create+close: ${(System.nanoTime()-t0)/1e6}%.1f ms, forks=${forks()-f0}")
    org.apache.commons.io.FileUtils.deleteDirectory(dir.toFile)
    spark.stop()
  }
}
