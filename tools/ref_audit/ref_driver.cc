// Cross-implementation audit driver for the reference CTranslate2.
//
// Compiled against the UNMODIFIED reference sources (/root/reference/src)
// with the small API shims in ./shims (spdlog / cblas / cpu_features whose
// vendored submodules are not populated in this environment).  See
// CMakeLists.txt and run_audit.py.
//
// Reads one tokenized sentence per line (space-separated tokens) and
// prints, per line, one TSV record so that the TPU implementation's
// outputs can be diffed token-for-token and score-for-score:
//
//   translate mode:  <score>\t<tok> <tok> ...
//   score mode:      <total>\t<tok_score> <tok_score> ...
//   generate mode:   <score>\t<tok> <tok> ...   (decoder-only models)
//
// Usage:
//   ref_driver --model DIR [--beam N] [--num_hypotheses N]
//              [--length_penalty F] [--compute_type TYPE]
//              [--score --target FILE]
//              [--generate --max_length N] < source.txt

#include <fstream>
#include <iomanip>
#include <iostream>
#include <sstream>
#include <string>
#include <vector>

#include <ctranslate2/generator.h>
#include <ctranslate2/translator.h>

static std::vector<std::vector<std::string>> read_tokenized(std::istream& in) {
  std::vector<std::vector<std::string>> lines;
  std::string line;
  while (std::getline(in, line)) {
    std::vector<std::string> tokens;
    std::istringstream ss(line);
    std::string tok;
    while (ss >> tok)
      tokens.emplace_back(std::move(tok));
    lines.emplace_back(std::move(tokens));
  }
  return lines;
}

int main(int argc, char** argv) {
  std::string model_path;
  std::string target_path;
  std::string compute_type = "default";
  size_t beam_size = 2;
  size_t num_hypotheses = 1;
  float length_penalty = 1.f;
  bool score_mode = false;

  bool generate_mode = false;
  size_t max_length = 32;

  const auto need_value = [&](int i, const std::string& arg) {
    if (i + 1 >= argc) {
      std::cerr << arg << " requires a value" << std::endl;
      std::exit(2);
    }
  };
  for (int i = 1; i < argc; ++i) {
    const std::string arg = argv[i];
    const bool takes_value = (arg == "--model" || arg == "--target"
                              || arg == "--compute_type" || arg == "--beam"
                              || arg == "--num_hypotheses"
                              || arg == "--length_penalty"
                              || arg == "--max_length");
    if (takes_value)
      need_value(i, arg);
    if (arg == "--model")
      model_path = argv[++i];
    else if (arg == "--target")
      target_path = argv[++i];
    else if (arg == "--compute_type")
      compute_type = argv[++i];
    else if (arg == "--beam")
      beam_size = std::stoul(argv[++i]);
    else if (arg == "--num_hypotheses")
      num_hypotheses = std::stoul(argv[++i]);
    else if (arg == "--length_penalty")
      length_penalty = std::stof(argv[++i]);
    else if (arg == "--max_length")
      max_length = std::stoul(argv[++i]);
    else if (arg == "--score")
      score_mode = true;
    else if (arg == "--generate")
      generate_mode = true;
    else {
      std::cerr << "unknown argument: " << arg << std::endl;
      return 2;
    }
  }
  if (model_path.empty()) {
    std::cerr << "--model is required" << std::endl;
    return 2;
  }

  const auto source = read_tokenized(std::cin);
  std::cout << std::setprecision(10);

  if (generate_mode) {
    // Decoder-only path through the reference Generator pool.
    ctranslate2::Generator generator(
        model_path, ctranslate2::Device::CPU,
        ctranslate2::str_to_compute_type(compute_type));
    ctranslate2::GenerationOptions options;
    options.beam_size = beam_size;
    options.num_hypotheses = num_hypotheses;
    options.length_penalty = length_penalty;
    options.max_length = max_length;
    options.return_scores = true;
    options.include_prompt_in_result = false;
    auto futures = generator.generate_batch_async(source, options);
    for (auto& future : futures) {
      const auto result = future.get();
      std::cout << result.scores[0] << '\t';
      const auto& seq = result.sequences[0];
      for (size_t i = 0; i < seq.size(); ++i)
        std::cout << (i ? " " : "") << seq[i];
      std::cout << '\n';
    }
    return 0;
  }

  ctranslate2::Translator translator(
      model_path, ctranslate2::Device::CPU,
      ctranslate2::str_to_compute_type(compute_type));

  if (score_mode) {
    std::ifstream target_file(target_path);
    if (!target_file) {
      std::cerr << "cannot open --target " << target_path << std::endl;
      return 2;
    }
    const auto target = read_tokenized(target_file);
    ctranslate2::ScoringOptions options;
    const auto results = translator.score_batch(source, target, options);
    for (const auto& result : results) {
      std::cout << result.cumulated_score() << '\t';
      for (size_t i = 0; i < result.tokens_score.size(); ++i)
        std::cout << (i ? " " : "") << result.tokens_score[i];
      std::cout << '\n';
    }
  } else {
    ctranslate2::TranslationOptions options;
    options.beam_size = beam_size;
    options.num_hypotheses = num_hypotheses;
    options.length_penalty = length_penalty;
    options.return_scores = true;
    const auto results = translator.translate_batch(source, options);
    for (const auto& result : results) {
      for (size_t h = 0; h < result.num_hypotheses(); ++h) {
        std::cout << result.scores[h] << '\t';
        const auto& hyp = result.hypotheses[h];
        for (size_t i = 0; i < hyp.size(); ++i)
          std::cout << (i ? " " : "") << hyp[i];
        std::cout << '\n';
      }
    }
  }
  return 0;
}
