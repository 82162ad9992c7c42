package graft.streaming

import graft.json.Js

/** Consumer-lag snapshot for the `$lag` stage (reference
  * LagStage.java:36-110 + Work.java lag polling): end offset minus
  * committed offset per (group, topic, partition), rendered as
  * `{group: {topic: {"<partition>": lag}}}` — the exact message shape the
  * reference attaches under `as`.
  *
  * The Kafka admin surface is a narrow trait: tests drive the computation
  * with a fake; production uses the reflective kafka-clients default
  * (the client jar is a runtime-only dependency, exactly like the
  * `format("kafka")` data source).
  */
object KafkaLag {

  trait Admin {
    def groups(): Seq[String]
    /** Committed offset per (topic, partition) for the group. */
    def committed(group: String): Map[(String, Int), Long]
    /** Latest end offset per requested (topic, partition). */
    def endOffsets(tps: Seq[(String, Int)]): Map[(String, Int), Long]
  }

  /** One lag snapshot as the reference's JSON shape. */
  def snapshot(admin: Admin): String = {
    val root = Js.obj()
    admin.groups().foreach { g =>
      val commits = admin.committed(g)
      val ends = admin.endOffsets(commits.keys.toSeq)
      val byTopic = commits.toSeq
        .groupBy { case ((topic, _), _) => topic }
      val gNode = Js.obj()
      byTopic.toSeq.sortBy(_._1).foreach { case (topic, entries) =>
        val tNode = Js.obj()
        entries.sortBy(_._1._2).foreach { case ((_, p), committed) =>
          val lag = math.max(0L, ends.getOrElse((topic, p), committed) - committed)
          tNode.put(p.toString, lag)
        }
        gNode.set[com.fasterxml.jackson.databind.JsonNode](topic, tNode)
      }
      root.set[com.fasterxml.jackson.databind.JsonNode](g, gNode)
    }
    Js.render(root)
  }

  /** Provider closure for Env.lag backed by a kafka-clients AdminClient
    * reached via reflection (no compile-time dependency). One AdminClient
    * per bootstrap per JVM, reused across snapshots — creating one per
    * sample would leak sockets and admin threads for the stream's
    * lifetime.
    */
  def provider(bootstrap: String): () => String = {
    () => snapshot(admins.computeIfAbsent(bootstrap, b => reflectiveAdmin(b)))
  }

  private val admins =
    new java.util.concurrent.ConcurrentHashMap[String, Admin]()

  private def reflectiveAdmin(bootstrap: String): Admin = new Admin {
    private val adminCls = Class.forName("org.apache.kafka.clients.admin.Admin")
    private val admin: AnyRef = {
      val props = new java.util.Properties()
      props.put("bootstrap.servers", bootstrap)
      adminCls.getMethod("create", classOf[java.util.Properties])
        .invoke(null, props)
    }
    private def await(f: AnyRef): AnyRef = // KafkaFuture.get()
      f.getClass.getMethod("get").invoke(f)

    def groups(): Seq[String] = {
      val res = adminCls.getMethod("listConsumerGroups").invoke(admin)
      val all = await(res.getClass.getMethod("all").invoke(res))
        .asInstanceOf[java.util.Collection[AnyRef]]
      import scala.jdk.CollectionConverters._
      all.asScala.toSeq.map(l =>
        l.getClass.getMethod("groupId").invoke(l).asInstanceOf[String])
    }

    def committed(group: String): Map[(String, Int), Long] = {
      val res = adminCls
        .getMethod("listConsumerGroupOffsets", classOf[String])
        .invoke(admin, group)
      val map = await(res.getClass
        .getMethod("partitionsToOffsetAndMetadata").invoke(res))
        .asInstanceOf[java.util.Map[AnyRef, AnyRef]]
      import scala.jdk.CollectionConverters._
      map.asScala.map { case (tp, om) =>
        val topic = tp.getClass.getMethod("topic").invoke(tp)
          .asInstanceOf[String]
        val part = tp.getClass.getMethod("partition").invoke(tp)
          .asInstanceOf[java.lang.Integer].intValue()
        val off = om.getClass.getMethod("offset").invoke(om)
          .asInstanceOf[java.lang.Long].longValue()
        (topic, part) -> off
      }.toMap
    }

    def endOffsets(tps: Seq[(String, Int)]): Map[(String, Int), Long] = {
      val tpCls = Class.forName("org.apache.kafka.common.TopicPartition")
      val specCls = Class.forName("org.apache.kafka.clients.admin.OffsetSpec")
      val latest = specCls.getMethod("latest").invoke(null)
      val req = new java.util.HashMap[AnyRef, AnyRef]()
      tps.foreach { case (t, p) =>
        req.put(tpCls.getConstructor(classOf[String], classOf[Int])
          .newInstance(t, java.lang.Integer.valueOf(p)).asInstanceOf[AnyRef],
          latest)
      }
      val res = adminCls.getMethod("listOffsets", classOf[java.util.Map[_, _]])
        .invoke(admin, req)
      val map = await(res.getClass.getMethod("all").invoke(res))
        .asInstanceOf[java.util.Map[AnyRef, AnyRef]]
      import scala.jdk.CollectionConverters._
      map.asScala.map { case (tp, info) =>
        val topic = tp.getClass.getMethod("topic").invoke(tp)
          .asInstanceOf[String]
        val part = tp.getClass.getMethod("partition").invoke(tp)
          .asInstanceOf[java.lang.Integer].intValue()
        val off = info.getClass.getMethod("offset").invoke(info)
          .asInstanceOf[java.lang.Long].longValue()
        (topic, part) -> off
      }.toMap
    }
  }

  /** The reference emits at most one lag-annotated message per interval
    * (LagStage.filterMessages, 30 s): in-memory last-sample state per
    * stage instance, like its State<Instant>.
    */
  private val lastSample =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Long]()

  def sample(stageId: String, intervalMs: Long, nowMs: Long): Boolean = {
    // atomic claim: the naive get-then-put let two concurrent tasks both
    // observe the stale value and both pass, emitting two lag messages
    // for one interval. (Scope is per JVM by design — the reference's
    // LagStage samples per INSTANCE, and an executor is the instance
    // analog.)
    var claimed = false
    lastSample.compute(stageId, (_, prev) =>
      if (prev == null || nowMs >= prev + intervalMs) {
        claimed = true
        java.lang.Long.valueOf(nowMs)
      } else prev)
    claimed
  }
}
