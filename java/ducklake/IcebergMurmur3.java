package ducklake;

import java.nio.charset.StandardCharsets;
import java.time.Instant;
import java.time.LocalDate;
import java.time.LocalDateTime;
import java.time.ZoneOffset;

import org.apache.spark.sql.api.java.UDF2;

/**
 * Iceberg-spec murmur3_32 bucket transform, JVM-side.
 *
 * The reference's sole scalar function `murmur3_32` hashes values per
 * the Iceberg spec (bool/ints widen to an 8-byte little-endian long,
 * strings hash their UTF-8 bytes, seed 0 —
 * src/functions/ducklake_murmur3.cpp:9-107). Spark's builtin `hash()`
 * is murmur3 with seed 42 and different layouts, so it cannot be
 * reused. This UDF keeps bucket-partitioned WRITES on the JVM: the
 * pandas_udf form in functions/murmur3.py hashed each row in Python
 * behind an Arrow transfer, which is the write bottleneck on a large
 * bucket-partitioned ingest. The Python implementation stays as the
 * planner-side pruning path and the fallback when the jar is absent.
 *
 * call(value, n) returns (murmur3_32(value) & 0x7FFFFFFF) % n, the
 * reference's bucket id (ducklake_metadata_manager.cpp:1843-1853),
 * or null for null input.
 */
public class IcebergMurmur3 implements UDF2<Object, Integer, Integer> {

    private static final int C1 = 0xcc9e2d51;
    private static final int C2 = 0x1b873593;

    private static int mixK1(int k1) {
        k1 *= C1;
        k1 = Integer.rotateLeft(k1, 15);
        k1 *= C2;
        return k1;
    }

    private static int mixH1(int h1, int k1) {
        h1 ^= k1;
        h1 = Integer.rotateLeft(h1, 13);
        return h1 * 5 + 0xe6546b64;
    }

    private static int fmix(int h1, int length) {
        h1 ^= length;
        h1 ^= h1 >>> 16;
        h1 *= 0x85ebca6b;
        h1 ^= h1 >>> 13;
        h1 *= 0xc2b2ae35;
        h1 ^= h1 >>> 16;
        return h1;
    }

    /** murmur3_x86_32(seed 0) over the 8-byte little-endian long. */
    public static int hashLong(long v) {
        int k1 = mixK1((int) v);
        int h1 = mixH1(0, k1);
        k1 = mixK1((int) (v >>> 32));
        h1 = mixH1(h1, k1);
        return fmix(h1, 8);
    }

    /** murmur3_x86_32(seed 0) over raw bytes. */
    public static int hashBytes(byte[] data) {
        int h1 = 0;
        int nblocks = data.length / 4;
        for (int i = 0; i < nblocks; i++) {
            int base = 4 * i;
            int k1 = (data[base] & 0xff)
                    | ((data[base + 1] & 0xff) << 8)
                    | ((data[base + 2] & 0xff) << 16)
                    | ((data[base + 3] & 0xff) << 24);
            h1 = mixH1(h1, mixK1(k1));
        }
        int k1 = 0;
        for (int i = data.length - 1; i >= 4 * nblocks; i--) {
            k1 = (k1 << 8) | (data[i] & 0xff);
        }
        if ((data.length & 3) != 0) {
            h1 ^= mixK1(k1);
        }
        return fmix(h1, data.length);
    }

    public static int hashValue(Object v) {
        if (v instanceof Long) {
            return hashLong((Long) v);
        } else if (v instanceof Integer) {
            return hashLong(((Integer) v).longValue());
        } else if (v instanceof Short) {
            return hashLong(((Short) v).longValue());
        } else if (v instanceof Byte) {
            return hashLong(((Byte) v).longValue());
        } else if (v instanceof Boolean) {
            return hashLong(((Boolean) v) ? 1L : 0L);
        } else if (v instanceof String) {
            return hashBytes(((String) v).getBytes(StandardCharsets.UTF_8));
        } else if (v instanceof byte[]) {
            return hashBytes((byte[]) v);
        } else if (v instanceof java.sql.Date) {
            return hashLong(((java.sql.Date) v).toLocalDate().toEpochDay());
        } else if (v instanceof LocalDate) {
            return hashLong(((LocalDate) v).toEpochDay());
        } else if (v instanceof java.sql.Timestamp) {
            Instant i = ((java.sql.Timestamp) v).toInstant();
            return hashLong(i.getEpochSecond() * 1_000_000L + i.getNano() / 1_000L);
        } else if (v instanceof Instant) {
            Instant i = (Instant) v;
            return hashLong(i.getEpochSecond() * 1_000_000L + i.getNano() / 1_000L);
        } else if (v instanceof LocalDateTime) {
            Instant i = ((LocalDateTime) v).toInstant(ZoneOffset.UTC);
            return hashLong(i.getEpochSecond() * 1_000_000L + i.getNano() / 1_000L);
        } else if (v instanceof Double || v instanceof Float) {
            // Iceberg: float widens to double -> doubleToLongBits,
            // -0.0 normalized (ducklake_murmur3.cpp:56-79)
            double d = ((Number) v).doubleValue();
            if (d == 0.0) {
                d = 0.0;
            }
            return hashLong(Double.doubleToLongBits(d));
        } else if (v instanceof org.apache.spark.sql.Row
                || v instanceof scala.collection.Seq
                || v instanceof scala.collection.Map) {
            // complex types hash their duckdb-style display text
            // (ducklake_murmur3.cpp:87-91 Value::ToString)
            return hashBytes(renderValue(v).getBytes(StandardCharsets.UTF_8));
        }
        throw new IllegalArgumentException(
                "unsupported bucket value type: " + v.getClass().getName());
    }

    /** duckdb-style display text for nested values. */
    private static String renderValue(Object v) {
        if (v == null) {
            return "NULL";
        }
        if (v instanceof org.apache.spark.sql.Row) {
            org.apache.spark.sql.Row r = (org.apache.spark.sql.Row) v;
            StringBuilder sb = new StringBuilder("{");
            String[] names = r.schema() != null
                    ? r.schema().fieldNames() : null;
            for (int i = 0; i < r.length(); i++) {
                if (i > 0) {
                    sb.append(", ");
                }
                sb.append('\'')
                  .append(names != null ? names[i] : String.valueOf(i))
                  .append("': ")
                  .append(renderValue(r.get(i)));
            }
            return sb.append('}').toString();
        }
        if (v instanceof scala.collection.Seq) {
            scala.collection.Seq<?> s = (scala.collection.Seq<?>) v;
            StringBuilder sb = new StringBuilder("[");
            for (int i = 0; i < s.length(); i++) {
                if (i > 0) {
                    sb.append(", ");
                }
                sb.append(renderValue(s.apply(i)));
            }
            return sb.append(']').toString();
        }
        if (v instanceof scala.collection.Map) {
            scala.collection.Iterator<?> it =
                    ((scala.collection.Map<?, ?>) v).iterator();
            StringBuilder sb = new StringBuilder("{");
            boolean first = true;
            while (it.hasNext()) {
                scala.Tuple2<?, ?> kv = (scala.Tuple2<?, ?>) it.next();
                if (!first) {
                    sb.append(", ");
                }
                first = false;
                sb.append(renderValue(kv._1())).append("=")
                  .append(renderValue(kv._2()));
            }
            return sb.append('}').toString();
        }
        return String.valueOf(v);
    }

    @Override
    public Integer call(Object v, Integer n) {
        if (v == null || n == null) {
            return null;
        }
        return (hashValue(v) & 0x7FFFFFFF) % n;
    }
}
