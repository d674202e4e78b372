// Native TFRecord(GZIP) clip reader for pathtracker_tpu.
//
// Decodes a whole shard off the Python hot path: zlib-inflates the gzip
// stream, walks the TFRecord framing (u64 length + masked crc32c + payload +
// crc32c), and parses each tf.train.Example just enough to pull out the
// 'image' raw-uint8 clip and the 'label' byte — the schema of the reference
// pipeline (reference utils/TFRDataset.py:7-12). Exposed through a minimal
// C ABI consumed via ctypes (pathtracker_tpu/data/native.py); ctypes calls
// run with the GIL released, so the pipeline's worker threads scale.
//
// Build: make -C native   (produces libptdata.so)

#include <zlib.h>

#include <cstdint>
#include <cstring>
#include <memory>
#include <mutex>
#include <string>
#include <vector>

namespace {

struct Handle {
  std::vector<uint8_t> clips;  // contiguous [n, clip_bytes]
  std::vector<uint8_t> labels;
  std::vector<uint8_t> inflate_scratch;  // reused across reads
  long clip_bytes = 0;
};

// Freed handles are pooled and their vectors' capacity reused: on this class
// of VM, first-touch page faults on a fresh ~50-100MB allocation cost
// *seconds*, so re-inflating into recycled pages (already mapped) is ~15x
// faster than a fresh buffer per shard.
std::mutex g_pool_mu;
std::vector<std::unique_ptr<Handle>> g_pool;

std::unique_ptr<Handle> AcquireHandle() {
  std::lock_guard<std::mutex> lock(g_pool_mu);
  if (!g_pool.empty()) {
    auto h = std::move(g_pool.back());
    g_pool.pop_back();
    h->clips.clear();
    h->labels.clear();
    return h;
  }
  return std::make_unique<Handle>();
}

void ReleaseHandle(Handle* h) {
  std::lock_guard<std::mutex> lock(g_pool_mu);
  if (g_pool.size() < 4) {
    g_pool.emplace_back(h);
  } else {
    delete h;
  }
}

// Inflate a gzip (or zlib/raw-deflate) buffer; returns false on error.
bool GunzipAll(const uint8_t* data, size_t size, std::vector<uint8_t>* out) {
  z_stream zs;
  std::memset(&zs, 0, sizeof(zs));
  if (inflateInit2(&zs, 16 + MAX_WBITS) != Z_OK) return false;
  zs.next_in = const_cast<Bytef*>(data);
  zs.avail_in = static_cast<uInt>(size);
  out->clear();
  // gzip stores the uncompressed size (mod 2^32) in the last 4 bytes; use it
  // to reserve exactly once instead of doubling through 100MB reallocs.
  if (size >= 4) {
    uint32_t isize;
    std::memcpy(&isize, data + size - 4, 4);
    out->reserve(isize);
  }
  std::vector<uint8_t> buf(1 << 20);
  int rc = Z_OK;
  while (rc != Z_STREAM_END) {
    zs.next_out = buf.data();
    zs.avail_out = static_cast<uInt>(buf.size());
    rc = inflate(&zs, Z_NO_FLUSH);
    if (rc != Z_OK && rc != Z_STREAM_END) {
      inflateEnd(&zs);
      return false;
    }
    out->insert(out->end(), buf.data(), buf.data() + (buf.size() - zs.avail_out));
    if (rc == Z_STREAM_END && zs.avail_in > 0) {
      // Concatenated gzip members: restart.
      if (inflateReset2(&zs, 16 + MAX_WBITS) != Z_OK) {
        inflateEnd(&zs);
        return false;
      }
      rc = Z_OK;
    } else if (rc != Z_STREAM_END && zs.avail_in == 0 && zs.avail_out != 0) {
      // Truncated stream: fail loudly — silently decoding a partial shard
      // would train on a fraction of the data with no error.
      inflateEnd(&zs);
      return false;
    }
  }
  inflateEnd(&zs);
  return true;
}

// --- protobuf wire-format walking ---------------------------------------

bool ReadVarint(const uint8_t* buf, size_t size, size_t* pos, uint64_t* val) {
  uint64_t result = 0;
  int shift = 0;
  while (*pos < size && shift < 64) {
    uint8_t b = buf[(*pos)++];
    result |= static_cast<uint64_t>(b & 0x7F) << shift;
    if (!(b & 0x80)) {
      *val = result;
      return true;
    }
    shift += 7;
  }
  return false;
}

struct Span {
  const uint8_t* data = nullptr;
  size_t size = 0;
};

// Iterate fields of a message; for field `want` with wire type 2, invoke fn.
template <typename Fn>
bool ForEachLengthDelimited(Span msg, uint32_t want, Fn fn) {
  size_t pos = 0;
  while (pos < msg.size) {
    uint64_t key;
    if (!ReadVarint(msg.data, msg.size, &pos, &key)) return false;
    uint32_t field = static_cast<uint32_t>(key >> 3);
    uint32_t wire = key & 7;
    if (wire == 0) {
      uint64_t v;
      if (!ReadVarint(msg.data, msg.size, &pos, &v)) return false;
    } else if (wire == 1) {
      pos += 8;
    } else if (wire == 5) {
      pos += 4;
    } else if (wire == 2) {
      uint64_t len;
      if (!ReadVarint(msg.data, msg.size, &pos, &len)) return false;
      if (pos + len > msg.size) return false;
      if (field == want) fn(Span{msg.data + pos, static_cast<size_t>(len)});
      pos += len;
    } else {
      return false;
    }
  }
  return true;
}

// Parse one Example payload: locate the 'image' bytes span and label byte.
bool ParseExample(Span payload, Span* image, uint8_t* label) {
  // Example.features = field 1
  ForEachLengthDelimited(payload, 1, [&](Span features) {
    // Features.feature (map entry) = field 1
    ForEachLengthDelimited(features, 1, [&](Span entry) {
      std::string key;
      Span feature{};
      ForEachLengthDelimited(entry, 1, [&](Span k) {
        key.assign(reinterpret_cast<const char*>(k.data), k.size);
      });
      ForEachLengthDelimited(entry, 2, [&](Span f) { feature = f; });
      if (feature.data == nullptr) return;
      if (key == "image" || key == "label") {
        // Feature.bytes_list = field 1; BytesList.value = field 1
        ForEachLengthDelimited(feature, 1, [&](Span bytes_list) {
          ForEachLengthDelimited(bytes_list, 1, [&](Span value) {
            if (key == "image") {
              *image = value;
            } else if (value.size >= 1) {
              *label = value.data[0];
            }
          });
        });
      }
    });
  });
  return image->data != nullptr;
}

// --- CRC32C (Castagnoli), slice-by-8 -------------------------------------
// Used by the Python TFRecord *writer* (pathtracker_tpu/data/tfrecord.py):
// the per-record masked CRCs dominate write time in pure Python (~97 ms per
// 98 KB clip record, measured); this table-driven form runs ~1 GB/s.

uint32_t g_crc_tables[8][256];
std::once_flag g_crc_once;

void InitCrcTables() {
  for (uint32_t i = 0; i < 256; ++i) {
    uint32_t crc = i;
    for (int k = 0; k < 8; ++k) {
      crc = (crc >> 1) ^ ((crc & 1) ? 0x82F63B78u : 0);
    }
    g_crc_tables[0][i] = crc;
  }
  for (uint32_t i = 0; i < 256; ++i) {
    uint32_t crc = g_crc_tables[0][i];
    for (int t = 1; t < 8; ++t) {
      crc = (crc >> 8) ^ g_crc_tables[0][crc & 0xFF];
      g_crc_tables[t][i] = crc;
    }
  }
}

uint32_t Crc32c(const uint8_t* data, size_t n) {
  std::call_once(g_crc_once, InitCrcTables);
  uint32_t crc = 0xFFFFFFFFu;
  size_t pos = 0;
  while (pos + 8 <= n) {
    uint32_t lo, hi;
    std::memcpy(&lo, data + pos, 4);
    std::memcpy(&hi, data + pos + 4, 4);
    lo ^= crc;
    crc = g_crc_tables[7][lo & 0xFF] ^ g_crc_tables[6][(lo >> 8) & 0xFF] ^
          g_crc_tables[5][(lo >> 16) & 0xFF] ^ g_crc_tables[4][lo >> 24] ^
          g_crc_tables[3][hi & 0xFF] ^ g_crc_tables[2][(hi >> 8) & 0xFF] ^
          g_crc_tables[1][(hi >> 16) & 0xFF] ^ g_crc_tables[0][hi >> 24];
    pos += 8;
  }
  for (; pos < n; ++pos) {
    crc = (crc >> 8) ^ g_crc_tables[0][(crc ^ data[pos]) & 0xFF];
  }
  return crc ^ 0xFFFFFFFFu;
}

}  // namespace

extern "C" {

unsigned int ptdata_crc32c(const unsigned char* data, long n) {
  return Crc32c(data, static_cast<size_t>(n));
}

void* ptdata_read_file(const char* path, int clip_bytes) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return nullptr;
  std::fseek(f, 0, SEEK_END);
  long fsize = std::ftell(f);
  std::fseek(f, 0, SEEK_SET);
  std::vector<uint8_t> raw(static_cast<size_t>(fsize));
  size_t got = std::fread(raw.data(), 1, raw.size(), f);
  std::fclose(f);
  if (got != raw.size()) return nullptr;

  auto handle = AcquireHandle();
  handle->clip_bytes = clip_bytes;
  std::vector<uint8_t>& data = handle->inflate_scratch;
  if (raw.size() >= 2 && raw[0] == 0x1F && raw[1] == 0x8B) {
    if (!GunzipAll(raw.data(), raw.size(), &data)) return nullptr;
  } else {
    data.assign(raw.begin(), raw.end());
  }

  Handle* h = handle.release();
  // First pass: count records from the framing alone, then reserve exactly.
  size_t pos = 0;
  long count = 0;
  while (pos + 12 <= data.size()) {
    uint64_t length;
    std::memcpy(&length, data.data() + pos, 8);
    pos += 12;
    if (pos + length + 4 > data.size()) break;
    ++count;
    pos += length + 4;
  }
  // A well-formed TFRecord ends exactly on a record boundary. Leftover bytes
  // mean the inner framing is cut (truncated copy that still closed its gzip
  // member): fail loudly — silently dropping the tail records would train on
  // a fraction of the shard with no error.
  if (pos != data.size()) {
    ReleaseHandle(h);
    return nullptr;
  }
  h->clips.reserve(static_cast<size_t>(count) * clip_bytes);
  h->labels.reserve(count);
  // Second pass: parse and append straight into the contiguous buffer.
  pos = 0;
  while (pos + 12 <= data.size()) {
    uint64_t length;
    std::memcpy(&length, data.data() + pos, 8);
    pos += 12;  // skip length crc
    if (pos + length + 4 > data.size()) break;
    Span image{};
    uint8_t label = 0;
    if (ParseExample(Span{data.data() + pos, static_cast<size_t>(length)},
                     &image, &label) &&
        static_cast<long>(image.size) == clip_bytes) {
      h->clips.insert(h->clips.end(), image.data, image.data + image.size);
      h->labels.push_back(label);
    }
    pos += length + 4;  // skip payload crc
  }
  // Records existed but none parsed with the expected clip size: the caller's
  // timesteps/shape is wrong or the file isn't this schema — error, don't
  // silently yield an empty shard.
  if (count > 0 && h->labels.empty()) {
    ReleaseHandle(h);
    return nullptr;
  }
  return h;
}

long ptdata_num_records(void* handle) {
  return static_cast<Handle*>(handle)->labels.size();
}

// Zero-copy access to the contiguous clip storage.
const unsigned char* ptdata_clips_ptr(void* handle) {
  return static_cast<Handle*>(handle)->clips.data();
}

const unsigned char* ptdata_labels_ptr(void* handle) {
  return static_cast<Handle*>(handle)->labels.data();
}

int ptdata_copy_clips(void* handle, void* clips_out, void* labels_out, long n) {
  auto* h = static_cast<Handle*>(handle);
  if (n > static_cast<long>(h->labels.size())) return 1;
  std::memcpy(clips_out, h->clips.data(), n * h->clip_bytes);
  std::memcpy(labels_out, h->labels.data(), n);
  return 0;
}

void ptdata_free(void* handle) { ReleaseHandle(static_cast<Handle*>(handle)); }

}  // extern "C"
