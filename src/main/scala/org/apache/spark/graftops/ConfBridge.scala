package org.apache.spark.graftops

import org.apache.hadoop.conf.Configuration
import org.apache.spark.util.SerializableConfiguration

/** Private-API shim: `org.apache.spark.util.SerializableConfiguration` is
  * `private[spark]`, but a distributed file copy (backup/restore fan-out)
  * needs the driver's Hadoop configuration on executors — credentials,
  * filesystem implementations and object-store settings live there, and
  * rebuilding a `Configuration` from classpath defaults inside a task
  * would silently drop them on a real cluster.
  */
final class SerializableHadoopConf(@transient conf: Configuration)
    extends Serializable {
  private val wrapped = new SerializableConfiguration(conf)

  /** The rehydrated configuration (task-side). */
  def value: Configuration = wrapped.value
}
