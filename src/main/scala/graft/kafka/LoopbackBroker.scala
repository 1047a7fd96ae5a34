package graft.kafka

import java.io.{DataInputStream, DataOutputStream, EOFException}
import java.net.{InetAddress, ServerSocket, Socket}
import scala.collection.mutable

/**
 * In-process Kafka broker speaking the same public wire protocol as
 * [[KafkaWireClient]] — the server side of ApiVersions v0, Metadata
 * v1, ListOffsets v1, Fetch v2/v4 and Produce v2/v3, over real
 * loopback sockets with an in-memory log per partition. `maxFormat`
 * selects the broker generation it impersonates: 2 (default)
 * advertises Produce ≤ 3 / Fetch ≤ 4 and serves v2 record batches
 * (the Kafka ≥ 0.11 / 4.x shape — fetch responses pack up to
 * [[LoopbackBroker.FetchBatchRecords]] records per batch so clients
 * exercise multi-batch walks); 1 advertises the pre-KIP-98 ceiling
 * (Produce ≤ 2 / Fetch ≤ 2) so the client's negotiation downgrade to
 * MessageSet v1 is testable against the same log.
 *
 * This is the stand-in that lets a zero-egress environment exercise
 * the ENTIRE Kafka ingestion path — framing, CRC validation, leader
 * routing, partial-message truncation, offset arithmetic — the same
 * strategy as the scripted SMTP server (M42), the scripted mongod
 * (M11d) and the signature-re-deriving DynamoDB fake (M11c). It
 * validates requests like a real broker would: CRCs are RE-CHECKED on
 * produce (corrupt batches get error 2), fetch/produce against a
 * partition whose leader is another broker returns
 * NOT_LEADER_FOR_PARTITION (error 6) so a client that skips metadata
 * routing fails the way it would in production, and fetch responses
 * are sliced at `max_bytes` mid-message, forcing consumers to handle
 * the protocol's partial-tail rule.
 *
 * A [[LoopbackCluster]] of N brokers shares one log store; partition
 * p of every topic leads on broker (p mod N), so multi-broker
 * metadata routing is exercised with real sockets.
 */
final class LoopbackCluster(topicPartitions: Map[String, Int],
                            numBrokers: Int = 1,
                            val maxFormat: Int = 2,
                            val fetchCodec: Int = 0,
                            val sasl: Option[(String, String)] = None,
                            val tlsContext: Option[javax.net.ssl.SSLContext] = None)
  extends AutoCloseable {
  require(numBrokers >= 1)
  require(maxFormat == 1 || maxFormat == 2, s"maxFormat must be 1 or 2, got $maxFormat")
  require(fetchCodec >= 0 && fetchCodec <= (if (maxFormat == 2) 4 else 3),
    s"fetchCodec $fetchCodec invalid for format $maxFormat (zstd is v2-only)")

  /** One partition's log: (timestamp, key, value) triples; offset =
    * startOffset + index. */
  final class Log {
    val records = mutable.ArrayBuffer.empty[(Long, Array[Byte], Array[Byte])]
    var startOffset: Long = 0L
    def endOffset: Long = startOffset + records.size
  }

  private val logs: Map[(String, Int), Log] =
    topicPartitions.flatMap { case (t, n) => (0 until n).map(p => (t, p) -> new Log) }

  def log(topic: String, partition: Int): Log = logs((topic, partition))

  private val leaderOverrides = new java.util.concurrent.ConcurrentHashMap[Integer, Integer]()

  def leaderId(partition: Int): Int =
    Option(leaderOverrides.get(Integer.valueOf(partition)))
      .map(_.intValue).getOrElse(partition % numBrokers)

  /** Move a partition's leadership to another broker MID-RUN — the
    * rolling-restart event: from this call on, metadata (from every
    * broker) names the new leader and the old leader answers
    * NOT_LEADER_FOR_PARTITION (6) to fetch/produce/listOffsets, which
    * is exactly what a real cluster does during a leader election. */
  def migrateLeader(partition: Int, toBroker: Int): Unit = {
    require(toBroker >= 0 && toBroker < numBrokers,
      s"no broker $toBroker in a $numBrokers-broker cluster")
    leaderOverrides.put(Integer.valueOf(partition), Integer.valueOf(toBroker))
  }

  /** Observability for connection-economy specs: TCP connections
    * accepted and successful SASL authentications, cluster-wide. */
  val connectionsAccepted = new java.util.concurrent.atomic.AtomicInteger(0)
  val saslAuthentications = new java.util.concurrent.atomic.AtomicInteger(0)

  /** Test hook, called at the top of every fetch for (topic,
    * partition, requestedOffset) — lets a spec trigger a leadership
    * migration MID-FETCH-LOOP deterministically. */
  @volatile var onFetch: (String, Int, Long) => Unit = (_, _, _) => ()

  val brokers: Seq[LoopbackBroker] =
    (0 until numBrokers).map(id => new LoopbackBroker(id, this))

  def bootstrapServers: String = brokers.map(b => s"127.0.0.1:${b.port}").mkString(",")
  /** Only the first broker — forces metadata-based discovery of the rest. */
  def firstBroker: String = s"127.0.0.1:${brokers.head.port}"

  /** Seed records directly (test fixture path, no client involved). */
  def append(topic: String, partition: Int,
             records: Seq[(Array[Byte], Array[Byte])], timestamp: Long = 1000L): Long =
    logs.synchronized {
      val l = log(topic, partition)
      val base = l.endOffset
      records.foreach { case (k, v) => l.records += ((timestamp, k, v)) }
      base
    }

  private[kafka] def withLogs[T](f: => T): T = logs.synchronized(f)
  private[kafka] def topics: Map[String, Int] = topicPartitions

  override def close(): Unit = brokers.foreach(_.close())
}

final class LoopbackBroker(val brokerId: Int, cluster: LoopbackCluster) extends AutoCloseable {
  import KafkaWire._

  private val server: ServerSocket = cluster.tlsContext match {
    case Some(ctx) => ctx.getServerSocketFactory
      .createServerSocket(0, 16, InetAddress.getLoopbackAddress)
    case None => new ServerSocket(0, 16, InetAddress.getLoopbackAddress)
  }
  val port: Int = server.getLocalPort
  @volatile private var running = true
  private val liveConnections =
    java.util.concurrent.ConcurrentHashMap.newKeySet[Socket]()

  private val acceptor = new Thread(() => {
    while (running) {
      try {
        val s = server.accept()
        cluster.connectionsAccepted.incrementAndGet()
        liveConnections.add(s)
        val t = new Thread(() => serve(s), s"loopback-kafka-$brokerId-conn")
        t.setDaemon(true)
        t.start()
      } catch { case _: Exception => /* closed */ }
    }
  }, s"loopback-kafka-$brokerId")
  acceptor.setDaemon(true)
  acceptor.start()

  private def serve(socket: Socket): Unit = {
    val in = new DataInputStream(new java.io.BufferedInputStream(socket.getInputStream))
    val out = new DataOutputStream(new java.io.BufferedOutputStream(socket.getOutputStream))
    // per-connection SASL session state (like a real SASL listener):
    // nothing but ApiVersions/SaslHandshake/SaslAuthenticate is
    // served before authentication completes — the connection is cut,
    // which is how real brokers treat unauthenticated API traffic
    var authenticated = cluster.sasl.isEmpty
    var mechanism: Option[String] = None
    var scramState: Option[Scram.ServerExchange] = None
    try {
      while (running) {
        val size = in.readInt()
        val req = new Array[Byte](size)
        in.readFully(req)
        val r = new Reader(req)
        val apiKey = r.int16()
        val apiVersion = r.int16()
        val correlationId = r.int32()
        r.string() // client_id
        val body: Array[Byte] = apiKey match {
          case ApiVersionsKey => handleApiVersions(apiVersion)
          case ApiSaslHandshake =>
            require(cluster.sasl.isDefined, "SASL handshake on a PLAINTEXT listener")
            val asked = r.string()
            val supported = Seq("PLAIN", "SCRAM-SHA-256")
            val w = new Writer()
            if (supported.contains(asked)) { mechanism = Some(asked); w.int16(0) }
            else w.int16(33) // UNSUPPORTED_SASL_MECHANISM
            w.int32(supported.size)
            supported.foreach(w.string)
            w.toBytes
          case ApiSaslAuthenticate =>
            val (user, pass) = cluster.sasl.getOrElse(
              throw new IllegalStateException("SaslAuthenticate on a PLAINTEXT listener"))
            val token = r.bytes()
            val utf8 = java.nio.charset.StandardCharsets.UTF_8
            def ok(serverToken: Array[Byte]): Array[Byte] =
              new Writer().int16(0).string(null).bytes(serverToken).toBytes
            def fail(msg: String): Array[Byte] =
              new Writer().int16(58).string(msg).bytes(Array.emptyByteArray).toBytes
            mechanism match {
              case None => fail("SaslAuthenticate before SaslHandshake")
              case Some("PLAIN") =>
                token match {
                  case Array() | null => fail("empty PLAIN token")
                  case t =>
                    new String(t, utf8).split("\u0000", -1) match {
                      case Array(_, u, p) if u == user && p == pass =>
                        authenticated = true
                        cluster.saslAuthentications.incrementAndGet()
                        ok(Array.emptyByteArray)
                      case Array(_, _, _) => fail("invalid credentials")
                      case _ => fail("malformed PLAIN token")
                    }
                }
              case Some("SCRAM-SHA-256") =>
                try scramState match {
                  case None =>
                    val salt = new Array[Byte](16)
                    new java.security.SecureRandom().nextBytes(salt)
                    val ex = new Scram.ServerExchange(user, pass, Scram.newNonce(), salt)
                    scramState = Some(ex)
                    ok(ex.serverFirst(new String(token, utf8)).getBytes(utf8))
                  case Some(ex) =>
                    val fin = ex.serverFinal(new String(token, utf8))
                    authenticated = true
                    cluster.saslAuthentications.incrementAndGet()
                    ok(fin.getBytes(utf8))
                } catch {
                  case e: IllegalArgumentException =>
                    scramState = None; fail(e.getMessage)
                }
              case Some(other) => fail(s"mechanism $other not implemented")
            }
          case _ if !authenticated =>
            throw new IllegalStateException(
              s"unauthenticated request (api $apiKey) on a SASL listener — connection cut")
          case ApiMetadata    => handleMetadata(r, apiVersion)
          case ApiListOffsets => handleListOffsets(r, apiVersion)
          case ApiFetch       => handleFetch(r, apiVersion)
          case ApiProduce     => handleProduce(r, apiVersion)
          case other => throw new IllegalArgumentException(s"unsupported api key $other")
        }
        val framed = new Writer().int32(correlationId).raw(body).toBytes
        out.writeInt(framed.length)
        out.write(framed)
        out.flush()
      }
    } catch {
      case _: EOFException | _: java.net.SocketException => // client went away
    } finally {
      liveConnections.remove(socket)
      try socket.close() catch { case _: Exception => }
    }
  }

  private def handleApiVersions(version: Short): Array[Byte] = {
    require(version == 0, s"ApiVersions v$version unsupported")
    val (produceMax, fetchMax) = if (cluster.maxFormat >= 2) (3, 4) else (2, 2)
    val apis = Seq((ApiProduce, 0, produceMax), (ApiFetch, 0, fetchMax),
      (ApiListOffsets, 0, 1), (ApiMetadata, 0, 1), (ApiVersionsKey, 0, 0),
      (ApiSaslHandshake, 0, 1), (ApiSaslAuthenticate, 0, 1))
    val w = new Writer().int16(0).int32(apis.size)
    apis.foreach { case (k, lo, hi) => w.int16(k).int16(lo).int16(hi) }
    w.toBytes
  }

  private def handleMetadata(r: Reader, version: Short): Array[Byte] = {
    require(version == 1, s"Metadata v$version unsupported")
    val n = r.int32()
    val asked = if (n < 0) cluster.topics.keys.toSeq.sorted
                else (0 until n).map(_ => r.string())
    val w = new Writer()
    w.int32(cluster.brokers.size)
    cluster.brokers.foreach { b =>
      w.int32(b.brokerId).string("127.0.0.1").int32(b.port).string(null) // rack
    }
    w.int32(0) // controller id
    w.int32(asked.size)
    asked.foreach { t =>
      cluster.topics.get(t) match {
        case Some(parts) =>
          w.int16(0).string(t).int8(0) // error, name, is_internal=false
          w.int32(parts)
          (0 until parts).foreach { p =>
            val leader = cluster.leaderId(p)
            w.int16(0).int32(p).int32(leader)
            w.int32(1).int32(leader) // replicas
            w.int32(1).int32(leader) // isr
          }
        case None =>
          w.int16(3).string(t).int8(0).int32(0) // UNKNOWN_TOPIC_OR_PARTITION
      }
    }
    w.toBytes
  }

  private def handleListOffsets(r: Reader, version: Short): Array[Byte] = {
    require(version == 1, s"ListOffsets v$version unsupported")
    r.int32() // replica_id
    val topics = (0 until r.int32()).map { _ =>
      val t = r.string()
      t -> (0 until r.int32()).map(_ => (r.int32(), r.int64()))
    }
    val w = new Writer().int32(topics.size)
    topics.foreach { case (t, parts) =>
      w.string(t).int32(parts.size)
      parts.foreach { case (p, ts) =>
        cluster.topics.get(t).filter(p < _) match {
          case Some(_) if cluster.leaderId(p) != brokerId =>
            w.int32(p).int16(6).int64(-1L).int64(-1L) // NOT_LEADER
          case Some(_) =>
            val off = cluster.withLogs {
              val l = cluster.log(t, p)
              if (ts == EarliestTimestamp) l.startOffset else l.endOffset
            }
            w.int32(p).int16(0).int64(-1L).int64(off)
          case None =>
            w.int32(p).int16(3).int64(-1L).int64(-1L)
        }
      }
    }
    w.toBytes
  }

  private def handleFetch(r: Reader, version: Short): Array[Byte] = {
    require(version == 2 || version == 4, s"Fetch v$version unsupported")
    require(version <= (if (cluster.maxFormat >= 2) 4 else 2),
      s"Fetch v$version above this broker's advertised ceiling")
    val v4 = version == 4
    r.int32(); r.int32(); r.int32() // replica_id, max_wait, min_bytes
    if (v4) { r.int32(); r.int8() } // response max_bytes, isolation_level
    val topics = (0 until r.int32()).map { _ =>
      val t = r.string()
      t -> (0 until r.int32()).map(_ => (r.int32(), r.int64(), r.int32()))
    }
    topics.foreach { case (t, parts) =>
      parts.foreach { case (p, off, _) => cluster.onFetch(t, p, off) }
    }
    val w = new Writer().int32(0) // throttle_time
    w.int32(topics.size)
    topics.foreach { case (t, parts) =>
      w.string(t).int32(parts.size)
      parts.foreach { case (p, offset, maxBytes) =>
        def partitionHeader(err: Short, hw: Long): Unit = {
          w.int32(p).int16(err).int64(hw)
          if (v4) { w.int64(hw); w.int32(0) } // last_stable_offset, aborted_txns
          ()
        }
        cluster.topics.get(t).filter(p < _) match {
          case Some(_) if cluster.leaderId(p) != brokerId =>
            partitionHeader(6, -1L); w.bytes(Array.emptyByteArray)
          case Some(_) =>
            val (hw, slice) = cluster.withLogs {
              val l = cluster.log(t, p)
              if (offset < l.startOffset || offset > l.endOffset)
                (l.endOffset, null: Array[Byte])
              else {
                val idx = (offset - l.startOffset).toInt
                // encode forward from the requested offset, stop once
                // past maxBytes (a real broker slices the log segment,
                // so the tail entry/batch may be PARTIAL — deliberately
                // reproduced here by hard truncation below). The v4
                // path packs records into v2 batches of up to
                // FetchBatchRecords so clients walk MULTIPLE batches
                // per response, like a real log of producer batches.
                val setW = new Writer()
                var written = 0
                var i = idx
                // cluster.fetchCodec compresses served sets — real
                // brokers store and serve producer-compressed batches,
                // so a consumer that cannot decompress dies on its
                // first real topic; this exercises that path e2e
                if (v4) {
                  while (i < l.records.size && written <= maxBytes) {
                    val n = math.min(LoopbackBroker.FetchBatchRecords, l.records.size - i)
                    val recs = (0 until n).map { j =>
                      val (ts, k, v) = l.records(i + j); OutRecord(k, v, ts)
                    }
                    val batch = encodeRecordBatch(recs, baseOffset = l.startOffset + i,
                      codec = cluster.fetchCodec)
                    setW.raw(batch)
                    written += batch.length
                    i += n
                  }
                } else if (cluster.fetchCodec != 0) {
                  while (i < l.records.size && written <= maxBytes) {
                    val n = math.min(LoopbackBroker.FetchBatchRecords, l.records.size - i)
                    val recs = (0 until n).map { j =>
                      val (ts, k, v) = l.records(i + j); OutRecord(k, v, ts)
                    }
                    // wrapper offset = ABSOLUTE offset of last inner
                    val entry = KafkaWire.compressedSetEntry(recs, cluster.fetchCodec,
                      l.startOffset + i + n - 1)
                    setW.raw(entry)
                    written += entry.length
                    i += n
                  }
                } else {
                  while (i < l.records.size && written <= maxBytes) {
                    val (ts, k, v) = l.records(i)
                    val m = encodeMessage(OutRecord(k, v, ts))
                    setW.int64(l.startOffset + i).int32(m.length).raw(m)
                    written += 12 + m.length
                    i += 1
                  }
                }
                val full = setW.toBytes
                (l.endOffset, if (full.length > maxBytes) full.take(maxBytes) else full)
              }
            }
            if (slice == null) {
              partitionHeader(1, hw); w.bytes(Array.emptyByteArray) // OFFSET_OUT_OF_RANGE
            } else {
              partitionHeader(0, hw); w.bytes(slice)
            }
          case None =>
            partitionHeader(3, -1L); w.bytes(Array.emptyByteArray)
        }
      }
    }
    w.toBytes
  }

  private def handleProduce(r: Reader, version: Short): Array[Byte] = {
    require(version == 2 || version == 3, s"Produce v$version unsupported")
    require(version <= (if (cluster.maxFormat >= 2) 3 else 2),
      s"Produce v$version above this broker's advertised ceiling")
    if (version >= 3) r.string() // transactional_id
    r.int16(); r.int32() // acks, timeout
    val topics = (0 until r.int32()).map { _ =>
      val t = r.string()
      t -> (0 until r.int32()).map(_ => (r.int32(), r.bytes()))
    }
    val w = new Writer().int32(topics.size)
    topics.foreach { case (t, parts) =>
      w.string(t).int32(parts.size)
      parts.foreach { case (p, setBytes) =>
        cluster.topics.get(t).filter(p < _) match {
          case Some(_) if cluster.leaderId(p) != brokerId =>
            w.int32(p).int16(6).int64(-1L).int64(-1L)
          case Some(_) =>
            // a real broker re-validates CRCs before append — CRC32
            // for v1 message sets, CRC32C for v2 record batches (the
            // unified decoder checks whichever format arrived)
            val decoded = try Right(decodeRecordSet(setBytes))
            catch { case e: IllegalArgumentException => Left(e) }
            decoded match {
              case Right(records) =>
                val base = cluster.withLogs {
                  val l = cluster.log(t, p)
                  val b = l.endOffset
                  records.foreach(rec => l.records += ((rec.timestamp, rec.key, rec.value)))
                  b
                }
                w.int32(p).int16(0).int64(base).int64(-1L)
              case Left(_) =>
                w.int32(p).int16(2).int64(-1L).int64(-1L) // CORRUPT_MESSAGE
            }
          case None =>
            w.int32(p).int16(3).int64(-1L).int64(-1L)
        }
      }
    }
    w.int32(0) // throttle_time
    w.toBytes
  }

  override def close(): Unit = {
    running = false
    try server.close() catch { case _: Exception => }
    // a dead broker resets its live connections — clients blocked on a
    // response must see a connection failure, not hang
    val it = liveConnections.iterator()
    while (it.hasNext) { try it.next().close() catch { case _: Exception => } }
    liveConnections.clear()
  }
}

object LoopbackBroker {
  /** Records per v2 batch in fetch responses — small on purpose so
    * any multi-record fetch exercises the client's multi-batch walk. */
  val FetchBatchRecords: Int = 3
}
