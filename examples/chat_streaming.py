"""Interactive chat with a converted decoder-only model.

Shows token streaming (`generate_tokens`) and static-prompt caching
(analog of the reference's examples/llama2 chat example).

    python examples/chat_streaming.py --model llama3_ct2 \
        --tokenizer meta-llama/Meta-Llama-3-8B-Instruct
"""

import argparse


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model", required=True)
    p.add_argument("--tokenizer", required=True)
    p.add_argument("--system", default="You are a helpful assistant.")
    p.add_argument("--max_length", type=int, default=512)
    p.add_argument("--topk", type=int, default=20)
    p.add_argument("--temperature", type=float, default=0.7)
    args = p.parse_args()

    import transformers

    import ctranslate2_tpu

    generator = ctranslate2_tpu.Generator(args.model, compute_type="int8")
    tok = transformers.AutoTokenizer.from_pretrained(args.tokenizer)

    def tokens(text):
        return tok.convert_ids_to_tokens(tok.encode(text))

    static_prompt = tokens(args.system)
    history = []
    while True:
        try:
            user = input("\nyou> ")
        except EOFError:
            break
        history.append(f"user: {user}\nassistant:")
        prompt = tokens("\n".join(history))
        reply_ids = []
        for step in generator.generate_tokens(
                prompt, static_prompt=static_prompt,
                max_length=args.max_length, sampling_topk=args.topk,
                sampling_temperature=args.temperature):
            reply_ids.append(step.token_id)
            print(tok.decode([step.token_id]), end="", flush=True)
        history.append(tok.decode(reply_ids))
        print()


if __name__ == "__main__":
    main()
