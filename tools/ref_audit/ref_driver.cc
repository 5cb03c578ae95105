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
//   whisper generate:<score>\t<no_speech_prob>\t<tok> <tok> ...
//   whisper detect:  <lang>:<prob> <lang>:<prob> ...   (per batch row)
//   whisper align:   <i>,<j> ...\t<text_token_prob> ...
//
// Usage:
//   ref_driver --model DIR [--beam N] [--num_hypotheses N]
//              [--length_penalty F] [--compute_type TYPE]
//              [--score --target FILE]
//              [--generate --max_length N] < source.txt
//   ref_driver --model DIR --whisper generate|detect|align
//              --features FILE --mels M --frames F --batch B
//              [--beam N] [--max_length N]
//              [--num-frames NF --median W]   (align)
//       generate: stdin = one prompt (token strings) per batch row
//       align:    stdin = start_sequence ids, then B lines of token ids

#include <fstream>
#include <iomanip>
#include <iostream>
#include <sstream>
#include <string>
#include <vector>

#include <ctranslate2/generator.h>
#include <ctranslate2/models/whisper.h>
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

  std::string whisper_task;
  std::string features_path;
  size_t mels = 0, frames = 0, batch = 1;
  std::string num_frames_arg;  // single value or comma list
  size_t median_width = 7;

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
                              || arg == "--max_length"
                              || arg == "--whisper" || arg == "--features"
                              || arg == "--mels" || arg == "--frames"
                              || arg == "--batch" || arg == "--num-frames"
                              || arg == "--median");
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
    else if (arg == "--whisper")
      whisper_task = argv[++i];
    else if (arg == "--features")
      features_path = argv[++i];
    else if (arg == "--mels")
      mels = std::stoul(argv[++i]);
    else if (arg == "--frames")
      frames = std::stoul(argv[++i]);
    else if (arg == "--batch")
      batch = std::stoul(argv[++i]);
    else if (arg == "--num-frames")
      num_frames_arg = argv[++i];
    else if (arg == "--median")
      median_width = std::stoul(argv[++i]);
    else {
      std::cerr << "unknown argument: " << arg << std::endl;
      return 2;
    }
  }
  if (model_path.empty()) {
    std::cerr << "--model is required" << std::endl;
    return 2;
  }

  std::cout << std::setprecision(10);

  if (!whisper_task.empty()) {
    // Whisper semantics audit (reference: src/models/whisper.cc): load
    // the fabricated artifact through the reference Whisper pool, read
    // the raw float32 mel features [batch, mels, frames] and run the
    // requested task so the TPU implementation's outputs can be diffed.
    if (features_path.empty() || !mels || !frames) {
      std::cerr << "--whisper needs --features/--mels/--frames" << std::endl;
      return 2;
    }
    std::ifstream feat_file(features_path, std::ios::binary);
    if (!feat_file) {
      std::cerr << "cannot open --features " << features_path << std::endl;
      return 2;
    }
    std::vector<float> feat_data(batch * mels * frames);
    feat_file.read(reinterpret_cast<char*>(feat_data.data()),
                   feat_data.size() * sizeof(float));
    ctranslate2::StorageView features(
        {static_cast<ctranslate2::dim_t>(batch),
         static_cast<ctranslate2::dim_t>(mels),
         static_cast<ctranslate2::dim_t>(frames)}, feat_data);

    ctranslate2::models::Whisper whisper(
        model_path, ctranslate2::Device::CPU,
        ctranslate2::str_to_compute_type(compute_type));

    if (whisper_task == "generate") {
      const auto prompts = read_tokenized(std::cin);
      ctranslate2::models::WhisperOptions options;
      options.beam_size = beam_size;
      options.num_hypotheses = num_hypotheses;
      options.length_penalty = length_penalty;
      options.max_length = max_length;
      options.return_scores = true;
      options.return_no_speech_prob = true;
      auto futures = whisper.generate(features, prompts, options);
      for (auto& future : futures) {
        const auto result = future.get();
        std::cout << result.scores[0] << '\t' << result.no_speech_prob
                  << '\t';
        const auto& seq = result.sequences[0];
        for (size_t i = 0; i < seq.size(); ++i)
          std::cout << (i ? " " : "") << seq[i];
        std::cout << '\n';
      }
    } else if (whisper_task == "detect") {
      auto futures = whisper.detect_language(features);
      for (auto& future : futures) {
        const auto result = future.get();
        for (size_t i = 0; i < result.size(); ++i)
          std::cout << (i ? " " : "") << result[i].first << ':'
                    << result[i].second;
        std::cout << '\n';
      }
    } else if (whisper_task == "align") {
      // stdin: line 1 = start_sequence ids; then one line of text-token
      // ids per batch row.
      const auto lines = read_tokenized(std::cin);
      std::vector<size_t> start_sequence;
      for (const auto& tok : lines.at(0))
        start_sequence.push_back(std::stoul(tok));
      std::vector<std::vector<size_t>> text_tokens;
      for (size_t b = 1; b < lines.size(); ++b) {
        std::vector<size_t> row;
        for (const auto& tok : lines[b])
          row.push_back(std::stoul(tok));
        text_tokens.push_back(std::move(row));
      }
      std::vector<size_t> num_frames;
      if (num_frames_arg.empty()) {
        num_frames.assign(text_tokens.size(), frames);
      } else if (num_frames_arg.find(',') == std::string::npos) {
        num_frames.assign(text_tokens.size(), std::stoul(num_frames_arg));
      } else {
        std::istringstream ss(num_frames_arg);
        std::string part;
        while (std::getline(ss, part, ','))
          num_frames.push_back(std::stoul(part));
      }
      auto futures = whisper.align(features, start_sequence, text_tokens,
                                   num_frames, median_width);
      for (auto& future : futures) {
        const auto result = future.get();
        for (size_t i = 0; i < result.alignments.size(); ++i)
          std::cout << (i ? " " : "") << result.alignments[i].first << ','
                    << result.alignments[i].second;
        std::cout << '\t';
        for (size_t i = 0; i < result.text_token_probs.size(); ++i)
          std::cout << (i ? " " : "") << result.text_token_probs[i];
        std::cout << '\n';
      }
    } else {
      std::cerr << "unknown --whisper task: " << whisper_task << std::endl;
      return 2;
    }
    return 0;
  }

  const auto source = read_tokenized(std::cin);

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
