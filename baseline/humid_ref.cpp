// humid_ref — single-core, single-threaded baseline with the reference
// semantics of jfjlaros/HUMID (trie-based neighbour search + directional/
// maximum clustering).  Written from the behavioural spec in SURVEY.md;
// NOT a copy of the reference sources (the reference's submodules are not
// even present in this checkout).
//
// Purpose:
//   1. a measured single-core C++ baseline for bench.py's vs_baseline
//      (BASELINE.md: "≥10x reads/s over single-core C++ at 1 chip");
//   2. an independent golden oracle for end-to-end parity tests.
//
// Semantics mirrored (citations into /root/reference/src):
//   word construction     fastq.cc:57-66,96-168, humid.cc:24-59
//   UMI extraction        fastq.cc:72-93,192-218
//   trie + asymmetric Hamming search        humid.cc:113-130
//   directional clustering  cluster.cc:39-69,82-87
//   maximum clustering      cluster.cc:20-25,72-80
//   dedup representative    humid.cc:203-241 (maxLeaf + visited)
//   annotate (":cluster")   humid.cc:251-292
//   stats files             humid.cc:301-357
//
// Build: g++ -O2 -std=c++17 -o humid_ref humid_ref.cpp -lz

#include <zlib.h>

#include <algorithm>
#include <cstdint>
#include <filesystem>
#include <cstdio>
#include <cstring>
#include <ctime>
#include <map>
#include <memory>
#include <string>
#include <vector>

namespace {

// ----------------------------------------------------------------------
// FastQ input (gzip-transparent via zlib)
// ----------------------------------------------------------------------

struct Record {
  std::string name;  // header without '@'
  std::string seq;
  std::string strand;
  std::string qual;
};

class FastqIn {
 public:
  explicit FastqIn(const std::string& path) {
    f_ = gzopen(path.c_str(), "rb");
    if (!f_) {
      fprintf(stderr, "cannot open %s\n", path.c_str());
      exit(1);
    }
  }
  ~FastqIn() {
    if (f_) gzclose(f_);
  }
  bool next(Record* r) {
    std::string l0, l2;
    if (!getline(&l0)) return false;
    if (!getline(&r->seq)) return false;
    if (!getline(&r->strand)) return false;
    if (!getline(&r->qual)) return false;
    r->name = l0.size() && l0[0] == '@' ? l0.substr(1) : l0;
    return true;
  }

 private:
  bool getline(std::string* out) {
    out->clear();
    char buf[4096];
    for (;;) {
      if (!gzgets(f_, buf, sizeof(buf))) {
        int errnum = 0;
        gzerror(f_, &errnum);
        if (errnum != Z_OK && errnum != Z_STREAM_END) {
          // A truncated/corrupt .gz must not masquerade as clean EOF
          // (silently deduping a prefix would mask corruption).
          fprintf(stderr, "gzip read error (%d)\n", errnum);
          exit(2);
        }
        return !out->empty();
      }
      out->append(buf);
      if (!out->empty() && out->back() == '\n') {
        out->pop_back();
        if (!out->empty() && out->back() == '\r') out->pop_back();
        return true;
      }
    }
  }
  gzFile f_ = nullptr;
};

// ----------------------------------------------------------------------
// Word construction (fastq.cc semantics)
// ----------------------------------------------------------------------

std::string extract_last_field(const std::string& s, char sep) {
  auto p = s.rfind(sep);
  if (p == std::string::npos) return "";
  return s.substr(p + 1);
}

bool valid_umi(const std::string& u) {
  if (u.empty()) return false;
  for (char c : u)
    if (c != 'A' && c != 'C' && c != 'G' && c != 'T') return false;
  return true;
}

std::string extract_umi(const std::string& header) {
  auto sp = header.find(' ');
  std::string prefix = sp == std::string::npos ? header : header.substr(0, sp);
  std::string u = extract_last_field(prefix, '_');
  if (valid_umi(u)) return u;
  u = extract_last_field(prefix, ':');
  if (valid_umi(u)) return u;
  return "";
}

std::string cut_pad(const std::string& s, size_t size) {
  if (size <= s.size()) return s.substr(0, size);
  return s + std::string(size - s.size(), 'N');
}

std::vector<int> nt_from_file(int n_files, int length) {
  std::vector<int> out(n_files, length / n_files);
  out.back() += length % n_files;
  return out;
}

struct Word {
  std::vector<uint8_t> data;
  bool filtered = false;
};

int encode(char c) {
  switch (c) {
    case 'A': return 0;
    case 'C': return 1;
    case 'G': return 2;
    case 'T': return 3;
  }
  return -1;  // encodes as G(2), filtered
}

Word make_word(const std::vector<Record>& tuple,
               const std::vector<int>& nt_to_take, int umi_size) {
  Word w;
  std::string chars;
  if (umi_size > 0) chars += cut_pad(extract_umi(tuple[0].name), umi_size);
  for (size_t i = 0; i < tuple.size(); ++i)
    chars += cut_pad(tuple[i].seq, nt_to_take[i]);
  w.data.reserve(chars.size());
  for (char c : chars) {
    int e = encode(c);
    if (e < 0) {
      w.data.push_back(2);
      w.filtered = true;
    } else {
      w.data.push_back(uint8_t(e));
    }
  }
  return w;
}

// ----------------------------------------------------------------------
// 4-ary trie with leaf counts + neighbour graph
// ----------------------------------------------------------------------

struct Cluster {
  int64_t id = 0;
  int64_t max_count = 0;
  struct Leaf* max_leaf = nullptr;
  int64_t size = 0;
  bool visited = false;
};

struct Leaf {
  int64_t count = 0;
  std::vector<Leaf*> neighbours;
  Cluster* cluster = nullptr;
};

struct Node {
  Node* child[4] = {nullptr, nullptr, nullptr, nullptr};
  Leaf* leaf = nullptr;
};

class Trie {
 public:
  Node root;

  Leaf* add(const std::vector<uint8_t>& word) {
    Node* n = &root;
    for (uint8_t c : word) {
      if (!n->child[c]) n->child[c] = new_node();
      n = n->child[c];
    }
    if (!n->leaf) {
      leaves_.push_back(std::make_unique<Leaf>());
      n->leaf = leaves_.back().get();
    }
    n->leaf->count++;
    return n->leaf;
  }

  Leaf* find(const std::vector<uint8_t>& word) {
    Node* n = &root;
    for (uint8_t c : word) {
      n = n->child[c];
      if (!n) return nullptr;
    }
    return n->leaf;
  }

  // In-order walk (lexicographic word order).
  template <class F>
  void walk(F&& f) {
    std::vector<uint8_t> path;
    walk_(&root, path, f);
  }

  // Asymmetric bounded-mismatch search: visit every leaf whose word is
  // lexicographically AFTER `word` within Hamming distance <= dist
  // (each unordered pair yielded exactly once across the full walk,
  // matching trie.asymmetricHamming as consumed at humid.cc:118-124).
  template <class F>
  void asym_hamming(const std::vector<uint8_t>& word, int dist, F&& f) {
    asym_(&root, word, 0, dist, /*tight=*/true, f);
  }

  // Asymmetric bounded-Levenshtein search (trie.asymmetricLevenshtein as
  // consumed at humid.cc:140-158): visit every leaf lexicographically
  // AFTER `word` whose full-word edit distance (substitutions + indels)
  // is <= dist.  Classic DP-row-over-trie walk; subtrees whose words
  // sort before the query ("less") are pruned, so each unordered pair
  // is yielded exactly once across the full walk.
  template <class F>
  void asym_levenshtein(const std::vector<uint8_t>& word, int dist,
                        F&& f) {
    std::vector<int> row(word.size() + 1);
    for (size_t j = 0; j <= word.size(); ++j) row[j] = int(j);
    lev_(&root, word, 0, row, dist, /*tight=*/true, /*greater=*/false, f);
  }

 private:
  template <class F>
  void walk_(Node* n, std::vector<uint8_t>& path, F& f) {
    if (n->leaf) f(path, n->leaf);
    for (int c = 0; c < 4; ++c)
      if (n->child[c]) {
        path.push_back(uint8_t(c));
        walk_(n->child[c], path, f);
        path.pop_back();
      }
  }

  // tight: prefix so far equals the query prefix.  The first mismatching
  // symbol must be > query symbol (=> resulting word sorts after query);
  // afterwards any symbol is allowed while budget lasts.
  template <class F>
  void asym_(Node* n, const std::vector<uint8_t>& w, size_t d, int budget,
             bool tight, F& f) {
    if (d == w.size()) {
      if (n->leaf && !tight) f(n->leaf);  // tight==query itself: skip self
      return;
    }
    for (int c = 0; c < 4; ++c) {
      Node* ch = n->child[c];
      if (!ch) continue;
      if (c == w[d]) {
        asym_(ch, w, d + 1, budget, tight, f);
      } else if (budget > 0 && (!tight || c > w[d])) {
        asym_(ch, w, d + 1, budget - 1, false, f);
      }
    }
  }

  // tight: path == query prefix; greater: path already sorts after the
  // query.  Children with c < query[d] under tight lead only to words
  // sorting before the query and are pruned.
  template <class F>
  void lev_(Node* n, const std::vector<uint8_t>& w, size_t d,
            const std::vector<int>& row, int budget, bool tight,
            bool greater, F& f) {
    if (n->leaf && greater && row[w.size()] <= budget) f(n->leaf);
    for (int c = 0; c < 4; ++c) {
      Node* ch = n->child[c];
      if (!ch) continue;
      bool t2 = tight, g2 = greater;
      if (tight) {
        if (c == w[d]) {
          t2 = true;
          g2 = false;
        } else if (c > w[d]) {
          t2 = false;
          g2 = true;
        } else {
          continue;  // word would sort before the query
        }
      }
      std::vector<int> nr(w.size() + 1);
      nr[0] = row[0] + 1;
      int mn = nr[0];
      for (size_t j = 1; j <= w.size(); ++j) {
        int sub = row[j - 1] + (uint8_t(c) == w[j - 1] ? 0 : 1);
        int del = row[j] + 1;
        int ins = nr[j - 1] + 1;
        nr[j] = std::min(sub, std::min(del, ins));
        mn = std::min(mn, nr[j]);
      }
      if (mn <= budget) lev_(ch, w, d + 1, nr, budget, t2, g2, f);
    }
  }

  Node* new_node() {
    pool_.push_back(std::make_unique<Node>());
    return pool_.back().get();
  }
  std::vector<std::unique_ptr<Node>> pool_;
  std::vector<std::unique_ptr<Leaf>> leaves_;
};

// ----------------------------------------------------------------------
// Clustering (cluster.cc semantics; explicit stack)
// ----------------------------------------------------------------------

void assign_max(Leaf* seed, Cluster* cl) {
  std::vector<std::pair<Leaf*, size_t>> stack;
  seed->cluster = cl;
  cl->size += seed->count;
  if (seed->count > cl->max_count) {
    cl->max_count = seed->count;
    cl->max_leaf = seed;
  }
  stack.push_back({seed, 0});
  while (!stack.empty()) {
    auto& top = stack.back();
    if (top.second == top.first->neighbours.size()) {
      stack.pop_back();
      continue;
    }
    Leaf* nb = top.first->neighbours[top.second++];
    if (nb->cluster) continue;
    nb->cluster = cl;
    cl->size += nb->count;
    if (nb->count > cl->max_count) {
      cl->max_count = nb->count;
      cl->max_leaf = nb;
    }
    stack.push_back({nb, 0});
  }
}

void assign_directional(Leaf* seed, Cluster* cl) {
  // Hill climb with restart (cluster.cc:39-51).
  Leaf* node = seed;
  size_t i = 0;
  while (i < node->neighbours.size()) {
    Leaf* nb = node->neighbours[i++];
    if (!nb->cluster && nb->count >= 2 * node->count) {
      node = nb;
      i = 0;
    }
  }
  cl->max_count = node->count;  // updateMaxCount_ once (cluster.cc:84-85)
  cl->max_leaf = node;
  // Constrained >=2x descent (cluster.cc:58-69).
  std::vector<std::pair<Leaf*, size_t>> stack;
  node->cluster = cl;
  cl->size += node->count;
  stack.push_back({node, 0});
  while (!stack.empty()) {
    auto& top = stack.back();
    if (top.second == top.first->neighbours.size()) {
      stack.pop_back();
      continue;
    }
    Leaf* cur = top.first;
    Leaf* nb = cur->neighbours[top.second++];
    if (!nb->cluster && cur->count >= 2 * nb->count) {
      nb->cluster = cl;
      cl->size += nb->count;
      stack.push_back({nb, 0});
    }
  }
}

// ----------------------------------------------------------------------
// Output helpers (naming per fastq.cc:170-190)
// ----------------------------------------------------------------------

std::string basename_of(const std::string& p) {
  auto s = p.rfind('/');
  return s == std::string::npos ? p : p.substr(s + 1);
}

std::string make_name(const std::string& file, const std::string& dir,
                      const std::string& suffix) {
  std::string base = basename_of(file);
  auto dot = base.find('.');
  std::string out = dot == std::string::npos
                        ? base + "_" + suffix
                        : base.substr(0, dot) + "_" + suffix + base.substr(dot);
  return dir + "/" + out;
}

class Out {
 public:
  Out(const std::string& path) {
    gz_ = path.size() > 3 && path.compare(path.size() - 3, 3, ".gz") == 0;
    if (gz_)
      g_ = gzopen(path.c_str(), "wb4");
    else
      f_ = fopen(path.c_str(), "wb");
    if (!g_ && !f_) {  // unwritable -d: fail loudly, not on fwrite(null)
      fprintf(stderr, "cannot open %s for writing\n", path.c_str());
      exit(2);
    }
  }
  ~Out() {
    if (g_) gzclose(g_);
    if (f_) fclose(f_);
  }
  void write(const std::string& s) {
    if (gz_)
      gzwrite(g_, s.data(), unsigned(s.size()));
    else
      fwrite(s.data(), 1, s.size(), f_);
  }

 private:
  bool gz_ = false;
  gzFile g_ = nullptr;
  FILE* f_ = nullptr;
};

std::string record_str(const Record& r) {
  return "@" + r.name + "\n" + r.seq + "\n" + r.strand + "\n" + r.qual + "\n";
}

// ----------------------------------------------------------------------

// Timing log in the reference's format (log.cc:4-15): "<msg>... " at
// phase start, "done. (XmYs)\n" at phase end; nt-budget block after the
// first phase (humid.cc:80-87).
time_t start_message(FILE* f, const char* msg) {
  if (f) {
    fprintf(f, "%s... ", msg);
    fflush(f);
  }
  return time(nullptr);
}

void end_message(FILE* f, time_t start) {
  if (!f) return;
  long d = long(time(nullptr) - start);
  fprintf(f, "done. (%ldm%lds)\n", d / 60, d % 60);
  fflush(f);
}

struct Args {
  int n = 24;
  int m = 1;
  std::string log;
  std::string dir = ".";
  bool stats = false;
  bool dedup = true;
  bool annotate = false;
  bool edit = false;
  bool maximum = false;
  std::vector<std::string> files;
};

bool read_tuple(std::vector<FastqIn*>& ins, std::vector<Record>* tuple) {
  for (size_t i = 0; i < ins.size(); ++i)
    if (!ins[i]->next(&(*tuple)[i])) return false;  // stop at shortest file
  return true;
}

}  // namespace

int main(int argc, char** argv) {
  Args a;
  auto need_operand = [&](int i) {
    if (i + 1 >= argc) {
      fprintf(stderr, "%s requires an operand\n", argv[i]);
      exit(2);
    }
  };
  for (int i = 1; i < argc; ++i) {
    std::string s = argv[i];
    if (s == "-n") {
      need_operand(i);
      a.n = atoi(argv[++i]);
    } else if (s == "-m") {
      need_operand(i);
      a.m = atoi(argv[++i]);
    } else if (s == "-l") {
      need_operand(i);
      a.log = argv[++i];
    } else if (s == "-d") {
      need_operand(i);
      a.dir = argv[++i];
    } else if (s == "-s")
      a.stats = true;
    else if (s == "-q")
      a.dedup = !a.dedup;
    else if (s == "-a")
      a.annotate = true;
    else if (s == "-e")
      a.edit = true;
    else if (s == "-x")
      a.maximum = true;
    else
      a.files.push_back(s);
  }
  if (a.files.empty()) {
    fprintf(stderr, "usage: humid_ref [-n N] [-m M] [-d DIR] [-s] [-q] [-a] [-e] [-x] files...\n");
    return 1;
  }

  FILE* logf = a.log.empty() ? nullptr : fopen(a.log.c_str(), "w");

  // UMI peek on first record of first file (humid.cc:24-33).
  time_t t_nt = start_message(logf, "Determing nucleotides to take");
  int umi_len = 0;
  {
    FastqIn in(a.files[0]);
    Record r;
    if (in.next(&r)) umi_len = int(extract_umi(r.name).size());
  }
  int umi_size = std::min(umi_len, a.n);
  int from_file = a.n > umi_len ? a.n - umi_len : 0;
  std::vector<int> take = nt_from_file(int(a.files.size()), from_file);
  end_message(logf, t_nt);
  if (logf) {
    fprintf(logf, "  header: %d", umi_size);
    for (size_t i = 0; i < a.files.size(); ++i)
      fprintf(logf, "\n  %s: %d", a.files[i].c_str(), take[i]);
    fprintf(logf, "\n");
    fflush(logf);
  }

  // Pass 1: build trie.
  Trie trie;
  int64_t total = 0, usable = 0;
  time_t t_read = start_message(logf, "Reading data");
  {
    std::vector<std::unique_ptr<FastqIn>> owners;
    std::vector<FastqIn*> ins;
    for (auto& f : a.files) {
      owners.push_back(std::make_unique<FastqIn>(f));
      ins.push_back(owners.back().get());
    }
    std::vector<Record> tuple(a.files.size());
    while (read_tuple(ins, &tuple)) {
      ++total;
      Word w = make_word(tuple, take, umi_size);
      if (w.filtered) continue;
      ++usable;
      trie.add(w.data);
    }
  }
  end_message(logf, t_read);

  // Neighbour search (asymmetric; each unordered pair once).
  time_t t_nb = start_message(
      logf, a.edit ? "Calculating neighbours using Levenshtein distance"
                   : "Calculating neighbours using Hamming distance");
  int64_t unique_words = 0;
  trie.walk([&](std::vector<uint8_t>& path, Leaf* leaf) {
    ++unique_words;
    auto on_hit = [&](Leaf* hit) {
      if (hit == leaf) return;
      leaf->neighbours.push_back(hit);
      hit->neighbours.push_back(leaf);
    };
    if (a.edit)
      trie.asym_levenshtein(path, a.m, on_hit);
    else
      trie.asym_hamming(path, a.m, on_hit);
  });

  end_message(logf, t_nb);

  // Clustering (seeds in lexicographic order; ids from 1, humid.cc:177).
  time_t t_cl = start_message(
      logf, a.maximum ? "Calculating maximum clusters"
                      : "Calculating directional clusters");
  std::vector<std::unique_ptr<Cluster>> clusters;
  trie.walk([&](std::vector<uint8_t>&, Leaf* leaf) {
    if (leaf->cluster) return;
    clusters.push_back(std::make_unique<Cluster>());
    Cluster* cl = clusters.back().get();
    cl->id = int64_t(clusters.size());
    if (a.maximum)
      assign_max(leaf, cl);
    else
      assign_directional(leaf, cl);
  });

  end_message(logf, t_cl);

  // The reference creates the output directory before any writer opens
  // (create_directories(dirName), humid.cc:390); without this, fopen
  // returns nullptr and the first fwrite crashes.
  std::error_code dir_ec;
  std::filesystem::create_directories(a.dir, dir_ec);

  // Pass 2: outputs — two separate input passes exactly like the
  // reference (writeFiltered humid.cc:203-241, then writeAnnotated
  // humid.cc:251-292), each with its own log phase.
  if (a.dedup) {
    time_t t_out = start_message(logf, "Writing filtered results");
    std::vector<std::unique_ptr<Out>> douts;
    for (auto& f : a.files)
      douts.push_back(std::make_unique<Out>(make_name(f, a.dir, "dedup")));
    std::vector<std::unique_ptr<FastqIn>> owners;
    std::vector<FastqIn*> ins;
    for (auto& f : a.files) {
      owners.push_back(std::make_unique<FastqIn>(f));
      ins.push_back(owners.back().get());
    }
    std::vector<Record> tuple(a.files.size());
    while (read_tuple(ins, &tuple)) {
      Word w = make_word(tuple, take, umi_size);
      Leaf* leaf = w.filtered ? nullptr : trie.find(w.data);
      if (leaf && leaf->cluster->max_leaf == leaf &&
          !leaf->cluster->visited) {
        leaf->cluster->visited = true;
        for (size_t i = 0; i < tuple.size(); ++i)
          douts[i]->write(record_str(tuple[i]));
      }
    }
    end_message(logf, t_out);
  }
  if (a.annotate) {
    time_t t_ann = start_message(logf, "Writing annotated results");
    std::vector<std::unique_ptr<Out>> aouts;
    for (auto& f : a.files)
      aouts.push_back(
          std::make_unique<Out>(make_name(f, a.dir, "annotated")));
    std::vector<std::unique_ptr<FastqIn>> owners;
    std::vector<FastqIn*> ins;
    for (auto& f : a.files) {
      owners.push_back(std::make_unique<FastqIn>(f));
      ins.push_back(owners.back().get());
    }
    std::vector<Record> tuple(a.files.size());
    while (read_tuple(ins, &tuple)) {
      Word w = make_word(tuple, take, umi_size);
      Leaf* leaf = w.filtered ? nullptr : trie.find(w.data);
      int64_t cid = leaf ? leaf->cluster->id : 0;  // 0 = filtered
      for (size_t i = 0; i < tuple.size(); ++i) {
        Record r = tuple[i];
        r.name += ":" + std::to_string(cid);
        aouts[i]->write(record_str(r));
      }
    }
    end_message(logf, t_ann);
  }

  if (a.stats) {
    time_t t_st = start_message(logf,
                                "Calculating count and neighbour stats");
    std::map<int64_t, int64_t> counts, neigh, sizes;
    trie.walk([&](std::vector<uint8_t>&, Leaf* leaf) {
      counts[leaf->count]++;
      neigh[int64_t(leaf->neighbours.size())]++;
    });
    end_message(logf, t_st);
    for (auto& c : clusters) sizes[c->size]++;
    auto dump = [&](const char* name, std::map<int64_t, int64_t>& m) {
      Out o(a.dir + "/" + name);
      for (auto& kv : m)
        o.write(std::to_string(kv.first) + " " + std::to_string(kv.second) +
                "\n");
    };
    dump("counts.dat", counts);
    dump("neigh.dat", neigh);
    dump("clusters.dat", sizes);
    Out s(a.dir + "/stats.dat");
    s.write("total: " + std::to_string(total) + "\n");
    s.write("usable: " + std::to_string(usable) + "\n");
    s.write("unique: " + std::to_string(unique_words) + "\n");
    s.write("clusters: " + std::to_string(int64_t(clusters.size())) + "\n");
  }
  if (logf) fclose(logf);
  fprintf(stderr, "total=%lld usable=%lld unique=%lld clusters=%zu\n",
          (long long)total, (long long)usable, (long long)unique_words,
          clusters.size());
  return 0;
}
