package graft.io

import java.io.{ObjectInputStream, ObjectOutputStream}

import org.apache.hadoop.conf.Configuration

/** Java-serializable carrier for a Hadoop `Configuration`, so
  * executor-side readers open files through the SESSION's Hadoop conf
  * (which carries `spark.hadoop.*` overrides — object-store
  * credentials, endpoint configs) instead of a bare `new
  * Configuration()` that only sees the classpath's XML defaults.
  * `Configuration` is a Hadoop `Writable`, not `Serializable`, so the
  * wrapper round-trips it through its own write/readFields. */
final class SerializableHadoopConf(@transient var value: Configuration)
    extends Serializable {
  private def writeObject(out: ObjectOutputStream): Unit = {
    out.defaultWriteObject()
    value.write(out)
  }
  private def readObject(in: ObjectInputStream): Unit = {
    in.defaultReadObject()
    value = new Configuration(false)
    value.readFields(in)
  }
}
