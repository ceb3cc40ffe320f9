"""JVM helper artifacts (compiled once, cached, committed).

`bgzf-codec.jar` holds exonspark.hadoop.BgzfCodec — a splittable Hadoop
compression codec for BGZF (suffix ".bgz") that lets spark.read.text/csv
fan a multi-GB bgzipped file out across executors with zero Python in the
data path (see java/exonspark/hadoop/BgzfCodec.java). The jar is committed
so the codec works without a JDK; when javac is available and the source
is newer than the jar, ensure_bgzf_jar() rebuilds it.
"""

from __future__ import annotations

import os
import shutil
import subprocess

_JVM_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC_DIR = os.path.join(_JVM_DIR, "java", "exonspark", "hadoop")
_JAR = os.path.join(_JVM_DIR, "bgzf-codec.jar")

BGZF_CODEC_CLASS = "exonspark.hadoop.BgzfCodec"
EXONCAT_FS_CLASS = "exonspark.hadoop.ExonCatFileSystem"


def _hadoop_api_jar() -> str | None:
    import pyspark

    jars = os.path.join(os.path.dirname(pyspark.__file__), "jars")
    try:
        for fn in sorted(os.listdir(jars)):
            if fn.startswith("hadoop-client-api") and fn.endswith(".jar"):
                return os.path.join(jars, fn)
    except OSError:
        return None
    return None


def ensure_bgzf_jar() -> str | None:
    """Path to the codec jar, rebuilding from source when possible and
    stale. Returns None only if the jar is absent AND cannot be built."""
    have_jar = os.path.exists(_JAR)
    srcs = sorted(
        os.path.join(_SRC_DIR, f)
        for f in (os.listdir(_SRC_DIR) if os.path.isdir(_SRC_DIR) else [])
        if f.endswith(".java")
    )
    src_newer = bool(srcs) and (
        not have_jar
        or max(os.path.getmtime(f) for f in srcs) > os.path.getmtime(_JAR)
    )
    if have_jar and not src_newer:
        return _JAR
    javac = shutil.which("javac")
    jar = shutil.which("jar") or os.path.join(
        os.environ.get("JAVA_HOME", ""), "bin", "jar"
    )
    hadoop = _hadoop_api_jar()
    if not (javac and os.path.exists(jar) and hadoop and srcs):
        return _JAR if have_jar else None
    build = os.path.join(_JVM_DIR, "build")
    os.makedirs(build, exist_ok=True)
    try:
        subprocess.run(
            [javac, "-encoding", "UTF-8", "-cp", hadoop, "-d", build, *srcs],
            check=True,
            capture_output=True,
        )
        subprocess.run(
            [jar, "cf", _JAR, "-C", build, "."], check=True, capture_output=True
        )
    except (subprocess.CalledProcessError, OSError):
        return _JAR if have_jar else None
    return _JAR
