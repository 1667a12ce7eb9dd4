// Native batch loader for preprocessed .npz utterances.
//
// The reference feeds the GPU through torch DataLoader worker *processes*
// (ref: dataset.py:26 num_workers=4).  Here the host-side data path is a
// C++ library: a minimal ZIP/NPY reader for numpy's np.savez (STORED
// entries), plus a multithreaded batch assembler that decodes, transposes
// (n_mels, T) -> (T, n_mels), zero-pads into bucket rectangles and writes
// straight into caller-provided (pinned) buffers — no Python objects, no
// GIL (callers invoke through ctypes, which releases the GIL).
//
// Exposed C ABI (see native.py):
//   ds_open(paths, n)            -> handle
//   ds_close(handle)
//   ds_load_batch(handle, indices, n, bp, bm, n_mels,
//                 phoneme_out, mel_out, p_lens, m_lens, n_threads) -> errors
//
// Compressed (deflated) npz members are unsupported by design — np.savez
// stores uncompressed; the Python wrapper falls back transparently.

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <thread>
#include <vector>

namespace {

struct Member {
  uint64_t data_offset;  // absolute offset of raw data in file
  uint64_t size;         // uncompressed == stored size
};

// ---- minimal .npy header parsing ------------------------------------------

struct NpyInfo {
  char dtype;       // 'f' float, 'i' int, 'u' uint, 'S'/'U' string-ish
  int itemsize;
  bool fortran;
  std::vector<uint64_t> shape;
  uint64_t data_offset;  // offset of array data relative to member start
};

bool parse_npy_header(FILE* f, uint64_t member_off, NpyInfo* out) {
  unsigned char magic[8];
  if (fseeko(f, (off_t)member_off, SEEK_SET) != 0) return false;
  if (fread(magic, 1, 8, f) != 8) return false;
  if (memcmp(magic, "\x93NUMPY", 6) != 0) return false;
  int major = magic[6];
  uint32_t header_len = 0;
  int pre;
  if (major == 1) {
    unsigned char b[2];
    if (fread(b, 1, 2, f) != 2) return false;
    header_len = b[0] | (b[1] << 8);
    pre = 10;
  } else {
    unsigned char b[4];
    if (fread(b, 1, 4, f) != 4) return false;
    header_len = b[0] | (b[1] << 8) | (b[2] << 16) | ((uint32_t)b[3] << 24);
    pre = 12;
  }
  std::string header(header_len, '\0');
  if (fread(&header[0], 1, header_len, f) != header_len) return false;

  auto find_val = [&](const char* key) -> std::string {
    size_t p = header.find(key);
    if (p == std::string::npos) return "";
    p = header.find(':', p);
    if (p == std::string::npos) return "";
    return header.substr(p + 1, 64);
  };

  std::string descr = find_val("'descr'");
  size_t q = descr.find('\'');
  if (q == std::string::npos) return false;
  std::string ds = descr.substr(q + 1, descr.find('\'', q + 1) - q - 1);
  // e.g. "<f4", "<i4", "<i8", "<U23"
  size_t ti = 0;
  if (ds[ti] == '<' || ds[ti] == '=' || ds[ti] == '|' || ds[ti] == '>') ti++;
  out->dtype = ds[ti];
  out->itemsize = atoi(ds.c_str() + ti + 1);
  if (out->dtype == 'U') out->itemsize *= 4;

  out->fortran = find_val("'fortran_order'").find("True") != std::string::npos;

  std::string sh = find_val("'shape'");
  out->shape.clear();
  size_t p = sh.find('(');
  if (p == std::string::npos) return false;
  size_t end = sh.find(')', p);
  std::string inner = sh.substr(p + 1, end - p - 1);
  char* cur = &inner[0];
  while (*cur) {
    while (*cur == ' ' || *cur == ',') cur++;
    if (!*cur) break;
    out->shape.push_back(strtoull(cur, &cur, 10));
  }
  out->data_offset = pre + header_len;
  return true;
}

// ---- minimal ZIP central-directory parsing (STORED entries only) ----------

bool find_member(FILE* f, const char* want_name, Member* out, bool* compressed) {
  // locate End Of Central Directory (no zip64 comment support needed)
  if (fseeko(f, 0, SEEK_END) != 0) return false;
  off_t fsize = ftello(f);
  const int kMax = 66000;
  int read_n = (int)(fsize < kMax ? fsize : kMax);
  std::vector<unsigned char> tail(read_n);
  if (fseeko(f, fsize - read_n, SEEK_SET) != 0) return false;
  if ((int)fread(tail.data(), 1, read_n, f) != read_n) return false;
  int eocd = -1;
  for (int i = read_n - 22; i >= 0; --i) {
    if (tail[i] == 0x50 && tail[i + 1] == 0x4b && tail[i + 2] == 0x05 &&
        tail[i + 3] == 0x06) {
      eocd = i;
      break;
    }
  }
  if (eocd < 0) return false;
  auto rd16 = [&](int off) { return (uint32_t)tail[off] | ((uint32_t)tail[off + 1] << 8); };
  auto rd32 = [&](int off) {
    return (uint32_t)tail[off] | ((uint32_t)tail[off + 1] << 8) |
           ((uint32_t)tail[off + 2] << 16) | ((uint32_t)tail[off + 3] << 24);
  };
  uint32_t n_entries = rd16(eocd + 10);
  uint64_t cd_off = rd32(eocd + 16);

  if (fseeko(f, (off_t)cd_off, SEEK_SET) != 0) return false;
  for (uint32_t e = 0; e < n_entries; ++e) {
    unsigned char h[46];
    if (fread(h, 1, 46, f) != 46) return false;
    if (!(h[0] == 0x50 && h[1] == 0x4b && h[2] == 0x01 && h[3] == 0x02)) return false;
    auto h16 = [&](int off) { return (uint32_t)h[off] | ((uint32_t)h[off + 1] << 8); };
    auto h32 = [&](int off) {
      return (uint32_t)h[off] | ((uint32_t)h[off + 1] << 8) |
             ((uint32_t)h[off + 2] << 16) | ((uint32_t)h[off + 3] << 24);
    };
    uint32_t method = h16(10);
    uint64_t csize = h32(20);
    uint32_t name_len = h16(28), extra_len = h16(30), comment_len = h16(32);
    uint64_t local_off = h32(42);
    std::string name(name_len, '\0');
    if (fread(&name[0], 1, name_len, f) != name_len) return false;
    if (fseeko(f, extra_len + comment_len, SEEK_CUR) != 0) return false;

    if (name == want_name) {
      if (method != 0) {
        *compressed = true;
        return false;
      }
      // local header: 30 bytes + name + extra (may differ from central!)
      unsigned char lh[30];
      off_t save = ftello(f);
      if (fseeko(f, (off_t)local_off, SEEK_SET) != 0) return false;
      if (fread(lh, 1, 30, f) != 30) return false;
      uint32_t lname = (uint32_t)lh[26] | ((uint32_t)lh[27] << 8);
      uint32_t lextra = (uint32_t)lh[28] | ((uint32_t)lh[29] << 8);
      out->data_offset = local_off + 30 + lname + lextra;
      out->size = csize;
      fseeko(f, save, SEEK_SET);
      return true;
    }
  }
  return false;
}

struct Dataset {
  std::vector<std::string> paths;
};

// load one utterance into padded row slots; returns 0 on success
int load_one(const Dataset* ds, int file_idx, int row, int bp, int bm, int n_mels,
             int32_t* phoneme_out, float* mel_out, int32_t* p_lens, int32_t* m_lens) {
  FILE* f = fopen(ds->paths[file_idx].c_str(), "rb");
  if (!f) return 1;
  int err = 0;
  bool compressed = false;
  Member seq_m, mel_m;
  NpyInfo seq_i, mel_i;
  if (!find_member(f, "sequence.npy", &seq_m, &compressed) ||
      !parse_npy_header(f, seq_m.data_offset, &seq_i) ||
      !find_member(f, "melspec.npy", &mel_m, &compressed) ||
      !parse_npy_header(f, mel_m.data_offset, &mel_i)) {
    fclose(f);
    return 2;
  }
  // sequence: int32/int64 1-D
  int64_t p_len = seq_i.shape.empty() ? 0 : (int64_t)seq_i.shape[0];
  if (p_len > bp) p_len = bp;
  int32_t* prow = phoneme_out + (size_t)row * bp;
  memset(prow, 0, sizeof(int32_t) * bp);
  if (fseeko(f, (off_t)(seq_m.data_offset + seq_i.data_offset), SEEK_SET) != 0) err = 3;
  if (!err && seq_i.dtype == 'i' && seq_i.itemsize == 4) {
    if ((int64_t)fread(prow, 4, p_len, f) != p_len) err = 3;
  } else if (!err && seq_i.dtype == 'i' && seq_i.itemsize == 8) {
    std::vector<int64_t> tmp(p_len);
    if ((int64_t)fread(tmp.data(), 8, p_len, f) != p_len) err = 3;
    for (int64_t i = 0; i < p_len; ++i) prow[i] = (int32_t)tmp[i];
  } else if (!err) {
    err = 4;
  }

  // melspec: float32 (n_mels, T) C-order -> transpose into (T, n_mels)
  int64_t mels = (int64_t)mel_i.shape[0];
  int64_t t_len = (int64_t)mel_i.shape[1];
  if (mels != n_mels || mel_i.dtype != 'f' || mel_i.itemsize != 4 || mel_i.fortran)
    err = err ? err : 5;
  int64_t t_clip = t_len > bm ? bm : t_len;
  float* mrow = mel_out + (size_t)row * bm * n_mels;
  memset(mrow, 0, sizeof(float) * (size_t)bm * n_mels);
  if (!err) {
    std::vector<float> raw((size_t)mels * t_len);
    if (fseeko(f, (off_t)(mel_m.data_offset + mel_i.data_offset), SEEK_SET) != 0 ||
        (int64_t)fread(raw.data(), 4, (size_t)mels * t_len, f) !=
            (int64_t)mels * t_len) {
      err = 6;
    } else {
      for (int64_t t = 0; t < t_clip; ++t)
        for (int64_t m = 0; m < mels; ++m)
          mrow[t * n_mels + m] = raw[m * t_len + t];
    }
  }
  fclose(f);
  if (err) return err;
  p_lens[row] = (int32_t)p_len;
  m_lens[row] = (int32_t)t_clip;
  return 0;
}

}  // namespace

extern "C" {

void* ds_open(const char** paths, int n_files) {
  Dataset* ds = new Dataset();
  ds->paths.reserve(n_files);
  for (int i = 0; i < n_files; ++i) ds->paths.emplace_back(paths[i]);
  return ds;
}

void ds_close(void* handle) { delete static_cast<Dataset*>(handle); }

// Returns number of per-item errors (0 == clean batch).
int ds_load_batch(void* handle, const int32_t* indices, int n, int bp, int bm,
                  int n_mels, int32_t* phoneme_out, float* mel_out,
                  int32_t* p_lens, int32_t* m_lens, int n_threads) {
  const Dataset* ds = static_cast<const Dataset*>(handle);
  if (n_threads < 1) n_threads = 1;
  if (n_threads > n) n_threads = n;
  std::vector<int> errors(n_threads, 0);
  std::vector<std::thread> workers;
  for (int w = 0; w < n_threads; ++w) {
    workers.emplace_back([&, w]() {
      for (int row = w; row < n; row += n_threads) {
        int e = load_one(ds, indices[row], row, bp, bm, n_mels, phoneme_out,
                         mel_out, p_lens, m_lens);
        if (e) errors[w]++;
      }
    });
  }
  for (auto& t : workers) t.join();
  int total = 0;
  for (int e : errors) total += e;
  return total;
}

}  // extern "C"
