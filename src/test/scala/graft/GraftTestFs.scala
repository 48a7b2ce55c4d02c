package graft

import java.net.URI

/** A second Hadoop FileSystem scheme for tests: `graftfs://<path>`
  * resolves to the local path, standing in for a remote store (s3a://,
  * hdfs://) so the URI-agnostic sinks' scheme-dispatch branch — the one
  * that takes the resolved non-file FileSystem instead of the raw
  * local fallback — is exercised for real. Registered through
  * src/test/resources/core-site.xml (`fs.graftfs.impl`), exactly how a
  * production deployment registers an object-store connector.
  */
class GraftTestFs extends org.apache.hadoop.fs.RawLocalFileSystem {
  override def getScheme: String = "graftfs"
  override def getUri: URI = URI.create("graftfs:///")
}
