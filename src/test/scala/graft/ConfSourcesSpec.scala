package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.ConfSources

/** Disabling Hadoop conf source tracking must change serialization
  * COST only — never the properties a (de)serialized or derived conf
  * carries. */
class ConfSourcesSpec extends AnyFunSuite {
  import TestSpark._

  test("conf round-trips all properties after disableTracking") {
    val conf = spark.sessionState.newHadoopConf()
    conf.set("graft.spec.probe", "v1")
    ConfSources.disableTracking(conf)
    conf.set("graft.spec.probe2", "v2") // set() must keep working
    val bos = new java.io.ByteArrayOutputStream()
    conf.write(new java.io.DataOutputStream(bos))
    val back = new org.apache.hadoop.conf.Configuration(false)
    back.readFields(new java.io.DataInputStream(
      new java.io.ByteArrayInputStream(bos.toByteArray)))
    assert(back.get("graft.spec.probe") == "v1")
    assert(back.get("graft.spec.probe2") == "v2")
    assert(back.size() == conf.size())
  }

  test("session-derived confs keep graft keys with tracking disabled on the context conf") {
    // Sessions.local installs the no-op map on the context conf; a
    // per-write derived conf must still carry the fs wiring
    val derived = spark.sessionState.newHadoopConfWithOptions(
      Map("path" -> "/tmp/x"))
    assert(derived.get("fs.file.impl") == "graft.sources.NioLocalFileSystem")
    assert(derived.get("fs.AbstractFileSystem.file.impl") == "graft.sources.NioLocalFs")
  }
}
