package graft

import java.lang.reflect.{InvocationHandler, Method, Proxy}

import graft.catalog.{IcebergHms, IcebergMeta}
import org.apache.hadoop.hive.metastore.api.{LockResponse, LockState, Table, ThriftHiveMetastore}
import org.apache.thrift.server.{TServer, TSimpleServer}
import org.apache.thrift.transport.TServerSocket
import org.json4s._
import org.json4s.jackson.JsonMethods

/** S5 over the Hive-Metastore thrift protocol, against an in-test stub
  * metastore: a REAL thrift server (libthrift TSimpleServer + the generated
  * ThriftHiveMetastore.Processor) whose Iface is a reflective proxy
  * implementing exactly the five calls the commit path uses — get_table,
  * alter_table, lock, check_lock, unlock. The client's transport, the lock
  * acquire/poll/release protocol, and the metadata pointer swap are all
  * exercised over a live socket, like IcebergRestSpec does for REST. */
class IcebergHmsSpec extends SparkSpec {

  private val Uuid = "9c12c3f4-0000-4000-8000-0000000000b2"

  private def initialDoc: String =
    s"""{
       |  "format-version": 2,
       |  "table-uuid": "$Uuid",
       |  "location": "s3://stub/warehouse/orders",
       |  "last-sequence-number": 0,
       |  "last-updated-ms": 1700000000000,
       |  "last-column-id": 3,
       |  "current-schema-id": 0,
       |  "schemas": [{
       |    "type": "struct", "schema-id": 0, "fields": [
       |      {"id": 1, "name": "o_orderkey", "required": true, "type": "long"},
       |      {"id": 2, "name": "o_orderdate", "required": false, "type": "date"},
       |      {"id": 3, "name": "o_orderstatus", "required": false, "type": "string"}
       |    ]}],
       |  "default-spec-id": 0,
       |  "partition-specs": [{"spec-id": 0, "fields": []}],
       |  "last-partition-id": 999,
       |  "default-sort-order-id": 0,
       |  "sort-orders": [{"order-id": 0, "fields": []}],
       |  "properties": {},
       |  "snapshots": []
       |}""".stripMargin

  /** Stub metastore state: one Iceberg table ("orders") whose pointer the
    * commit path swaps, plus a non-Iceberg "plain" table. Lock behavior is
    * scriptable (grant immediately / after N polls / never). */
  private class StubMetastore(initialLoc: String) {
    val params = new java.util.HashMap[String, String]()
    params.put("metadata_location", initialLoc)
    @volatile var lockedId: Option[Long] = None
    @volatile var grantAfterPolls = 0
    @volatile var neverGrant = false
    private var lockSeq = 0L
    val events = new java.util.concurrent.CopyOnWriteArrayList[String]()

    private def tableOf(name: String): Table = {
      val t = new Table()
      t.setDbName("lake"); t.setTableName(name)
      t.setParameters(
        if (name == "orders") new java.util.HashMap(params)
        else new java.util.HashMap[String, String]())
      t
    }

    val iface: ThriftHiveMetastore.Iface = Proxy.newProxyInstance(
      classOf[ThriftHiveMetastore.Iface].getClassLoader,
      Array[Class[_]](classOf[ThriftHiveMetastore.Iface]),
      new InvocationHandler {
        override def invoke(proxy: AnyRef, m: Method, args: Array[AnyRef]): AnyRef =
          StubMetastore.this.synchronized {
            m.getName match {
              case "get_table" =>
                events.add(s"get_table ${args(1)}")
                tableOf(args(1).asInstanceOf[String])
              case "alter_table" =>
                // the swap must happen UNDER the exclusive lock
                events.add(s"alter_table locked=${lockedId.isDefined}")
                params.clear()
                params.putAll(args(2).asInstanceOf[Table].getParameters)
                null
              case "lock" =>
                lockSeq += 1
                events.add(s"lock $lockSeq")
                if (neverGrant || grantAfterPolls > 0)
                  new LockResponse(lockSeq, LockState.WAITING)
                else { lockedId = Some(lockSeq); new LockResponse(lockSeq, LockState.ACQUIRED) }
              case "check_lock" =>
                events.add("check_lock")
                val id = lockSeq
                if (neverGrant) new LockResponse(id, LockState.WAITING)
                else {
                  grantAfterPolls -= 1
                  if (grantAfterPolls <= 0) {
                    lockedId = Some(id); new LockResponse(id, LockState.ACQUIRED)
                  } else new LockResponse(id, LockState.WAITING)
                }
              case "unlock" =>
                events.add("unlock")
                lockedId = None
                null
              case other =>
                throw new UnsupportedOperationException(
                  s"stub metastore does not implement $other")
            }
          }
      }).asInstanceOf[ThriftHiveMetastore.Iface]
  }

  private def withStub(test: (StubMetastore, IcebergHms.Catalog, String) => Unit): Unit = {
    val dir = java.nio.file.Files.createTempDirectory("graft_hms").toString
    val loc = s"$dir/00000-${java.util.UUID.randomUUID()}.metadata.json"
    java.nio.file.Files.write(java.nio.file.Paths.get(loc),
      initialDoc.getBytes("UTF-8"))
    val stub = new StubMetastore(s"file:$loc")
    val serverTransport = new TServerSocket(0)
    val server = new TSimpleServer(new TServer.Args(serverTransport)
      .processor(new ThriftHiveMetastore.Processor(stub.iface)))
    val t = new Thread(() => server.serve())
    t.setDaemon(true)
    t.start()
    val port = serverTransport.getServerSocket.getLocalPort
    try test(stub, IcebergHms.Catalog("127.0.0.1", port, "lake"), dir)
    finally server.stop()
  }

  test("parseUri accepts thrift://host:port/db and rejects malformed URIs") {
    assert(IcebergHms.parseUri("thrift://hms.internal:9083/lake") ==
      IcebergHms.Catalog("hms.internal", 9083, "lake"))
    assert(IcebergHms.parseUri("hms.internal:9083/lake") ==
      IcebergHms.Catalog("hms.internal", 9083, "lake"))
    intercept[IllegalArgumentException](IcebergHms.parseUri("hms.internal/lake"))
  }

  test("loadTable follows the metastore pointer; spec string renders; probe answers") {
    withStub { (_, cat, _) =>
      val (m, loc) = IcebergHms.loadTable(spark, cat, "orders")
      assert(m.schemaIds == Map("o_orderkey" -> 1, "o_orderdate" -> 2, "o_orderstatus" -> 3))
      assert(m.defaultSpecId == 0 && m.specs(0).isEmpty)
      assert(loc.endsWith(".metadata.json"))
      assert(IcebergHms.partitionSpecString(spark, cat, "orders") == "")
      assert(IcebergHms.isIcebergTable(cat, "orders"))
      assert(!IcebergHms.isIcebergTable(cat, "plain"))
      val e = intercept[IllegalArgumentException](
        IcebergHms.metadataLocation(cat, "plain"))
      assert(e.getMessage.contains("metadata_location"))
    }
  }

  test("REPLACE PARTITION SPEC swaps the pointer under the exclusive lock") {
    withStub { (stub, cat, dir) =>
      val before = stub.params.get("metadata_location")
      val loc = IcebergHms.replacePartitionSpec(spark, cat, "orders",
        Seq("month(o_orderdate)", "bucket(8, o_orderkey)"))
      // pointer swapped, lineage recorded, new doc written beside the old
      assert(stub.params.get("metadata_location") == loc)
      assert(stub.params.get("previous_metadata_location") == before)
      assert(new org.apache.hadoop.fs.Path(loc).getName.startsWith("00001-"))
      // the swap happened while the lock was held, and the lock was released
      import scala.jdk.CollectionConverters._
      val evs = stub.events.asScala.toSeq
      assert(evs.contains("alter_table locked=true"), evs.toString)
      assert(evs.last == "unlock", evs.toString)
      assert(stub.lockedId.isEmpty)
      // the committed document parses and has the evolved default spec
      val (m2, _) = IcebergHms.loadTable(spark, cat, "orders")
      assert(m2.defaultSpecId == 1)
      assert(m2.specs(1).map(f => (f.name, f.transform)) ==
        Seq(("o_orderdate_month", "month"), ("o_orderkey_bucket", "bucket[8]")))
      // second commit on the same fragments REUSES field ids (spec rule,
      // shared with the filesystem and REST paths via buildReplacementSpec)
      IcebergHms.replacePartitionSpec(spark, cat, "orders", Seq("month(o_orderdate)"))
      val (m3, _) = IcebergHms.loadTable(spark, cat, "orders")
      assert(m3.specs(2).head.fieldId == m2.specs(1).head.fieldId)
    }
  }

  test("a WAITING lock is polled until ACQUIRED before committing") {
    withStub { (stub, cat, _) =>
      stub.grantAfterPolls = 2
      val prevPoll = IcebergHms.LockPollMs
      IcebergHms.LockPollMs = 10L
      try {
        IcebergHms.replacePartitionSpec(spark, cat, "orders", Seq("o_orderstatus"))
        import scala.jdk.CollectionConverters._
        val evs = stub.events.asScala.toSeq
        assert(evs.count(_ == "check_lock") >= 1, evs.toString)
        assert(evs.contains("alter_table locked=true"))
      } finally IcebergHms.LockPollMs = prevPoll
    }
  }

  test("a lock that never grants fails loudly, releases the enqueued lock, commits nothing") {
    withStub { (stub, cat, _) =>
      stub.neverGrant = true
      val before = stub.params.get("metadata_location")
      val (prevT, prevP) = (IcebergHms.LockTimeoutMs, IcebergHms.LockPollMs)
      IcebergHms.LockTimeoutMs = 100L
      IcebergHms.LockPollMs = 10L
      try {
        val e = intercept[java.io.IOException](
          IcebergHms.replacePartitionSpec(spark, cat, "orders", Seq("o_orderstatus")))
        assert(e.getMessage.contains("could not acquire"), e.getMessage)
        import scala.jdk.CollectionConverters._
        assert(stub.events.asScala.last == "unlock",
          "an enqueued-but-unacquired lock must be released or it wedges the queue")
        assert(stub.params.get("metadata_location") == before, "no commit without the lock")
        assert(!stub.events.asScala.exists(_.startsWith("alter_table")))
      } finally { IcebergHms.LockTimeoutMs = prevT; IcebergHms.LockPollMs = prevP }
    }
  }

  test("the advisor's rendered spec block applies over HMS (--catalog hms: path)") {
    withStub { (stub, cat, _) =>
      val block = "month(o_orderdate),\nbucket(4, o_orderkey)"
      IcebergHms.applySpec(spark, cat, "orders", block)
      val (m, _) = IcebergHms.loadTable(spark, cat, "orders")
      assert(m.specs(m.defaultSpecId).map(_.transform) == Seq("month", "bucket[4]"))
    }
  }
}
