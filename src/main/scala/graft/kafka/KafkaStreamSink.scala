package graft.kafka

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.connector.write.streaming.{StreamingDataWriterFactory, StreamingWrite}
import org.apache.spark.sql.types.{BinaryType, StringType, StructType}

/**
 * Write side of the Kafka DataSource V2 provider: `writeStream
 * .format("graft.kafka.KafkaStreamProvider")` (and one-shot batch
 * `df.write`) produce to a topic over the wire client — the
 * kafka-sink contract: a required `value` column (binary or string)
 * and an optional `key` that routes via the default-partitioner
 * murmur2; keyless rows round-robin from the Spark partition id.
 *
 * Each Spark task opens its own producer connection and batches per
 * target partition (bounded buffers, flush at `batchSize`) — at 1000
 * tasks this is the same fan-in a kafka-clients producer fleet
 * presents. Micro-batch writes are at-least-once, the same contract
 * as the official sink: Kafka has no cross-partition transactions to
 * offer an epoch commit, so `commit` is bookkeeping only and replayed
 * epochs re-send (downstream dedup by key/offset is the standard
 * recipe).
 */
private[kafka] object KafkaWriteSupport {

  final case class KafkaWriterCommit() extends WriterCommitMessage

  def validate(schema: StructType): (Int, Option[Int]) = {
    val valueIdx = schema.fieldNames.indexOf("value")
    require(valueIdx >= 0,
      s"kafka write needs a 'value' column, got ${schema.fieldNames.mkString(", ")}")
    val keyIdx = schema.fieldNames.indexOf("key") match {
      case -1 => None
      case i => Some(i)
    }
    (valueIdx, keyIdx)
  }

  def bytesOf(row: InternalRow, idx: Int, dt: org.apache.spark.sql.types.DataType): Array[Byte] =
    if (row.isNullAt(idx)) null
    else dt match {
      case BinaryType => row.getBinary(idx)
      case StringType => row.getUTF8String(idx).getBytes
      case other => throw new IllegalArgumentException(
        s"kafka write column must be binary or string, got $other")
    }

  /** One task's writer: the shared [[KafkaBatch.PartitionedProducer]]
    * buffering over one client. */
  final class Writer(brokers: String, topic: String, schema: StructType,
                     taskPartitionId: Int, batchSize: Int = 500,
                     security: KafkaSecurity = KafkaSecurity(),
                     codec: Int = 0)
      extends DataWriter[InternalRow] {
    private val (valueIdx, keyIdx) = validate(schema)
    private val valueType = schema(valueIdx).dataType
    private val keyType = keyIdx.map(schema(_).dataType)
    private val client =
      new KafkaWireClient(KafkaBatch.parseBrokers(brokers), security = security)
    private val producer = new KafkaBatch.PartitionedProducer(client, topic,
      client.metadata(Seq(topic)).topics(topic).partitions.size,
      taskPartitionId, batchSize, codec)

    override def write(row: InternalRow): Unit =
      producer.send(keyIdx.map(i => bytesOf(row, i, keyType.get)).orNull,
        bytesOf(row, valueIdx, valueType))

    override def commit(): WriterCommitMessage = {
      producer.flushAll()
      KafkaWriterCommit()
    }
    override def abort(): Unit = () // at-least-once: already-produced records stay
    override def close(): Unit = client.close()
  }

  /** Serializable factory shipped to executors — holds only strings
    * and the schema, never the driver-side write info. */
  final case class Factory(brokers: String, topic: String, schema: StructType,
                           security: KafkaSecurity = KafkaSecurity(),
                           codec: Int = 0)
      extends DataWriterFactory with StreamingDataWriterFactory {
    override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
      new Writer(brokers, topic, schema, partitionId, security = security, codec = codec)
    override def createWriter(partitionId: Int, taskId: Long,
                              epochId: Long): DataWriter[InternalRow] =
      new Writer(brokers, topic, schema, partitionId, security = security, codec = codec)
  }

  final class Builder(brokers: String, topic: String, info: LogicalWriteInfo,
                      security: KafkaSecurity = KafkaSecurity(),
                      codec: Int = 0)
      extends WriteBuilder {
    override def build(): Write = {
      val schema = info.schema()
      validate(schema) // fail at plan time, not in the first task
      security.requireSerializable("kafka write") // Factory ships to executors
      new Write {
        override def toBatch: BatchWrite = new BatchWrite {
          override def createBatchWriterFactory(pi: PhysicalWriteInfo): DataWriterFactory =
            Factory(brokers, topic, schema, security, codec)
          override def commit(messages: Array[WriterCommitMessage]): Unit = ()
          override def abort(messages: Array[WriterCommitMessage]): Unit = ()
        }
        override def toStreaming: StreamingWrite = new StreamingWrite {
          override def createStreamingWriterFactory(pi: PhysicalWriteInfo): StreamingDataWriterFactory =
            Factory(brokers, topic, schema, security, codec)
          override def commit(epochId: Long, messages: Array[WriterCommitMessage]): Unit = ()
          override def abort(epochId: Long, messages: Array[WriterCommitMessage]): Unit = ()
        }
      }
    }
  }
}
