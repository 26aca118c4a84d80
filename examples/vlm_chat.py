"""Image chat against a running server (reference VLM examples).

    python -m xllm_tpu.server.api --model /path/to/qwen2-vl --port 8000
    python examples/vlm_chat.py --image photo.png "What is in this image?"
"""

import argparse
import base64
import json
import urllib.request


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("question", nargs="?", default="Describe this image.")
    ap.add_argument("--image", required=True)
    ap.add_argument("--url", default="http://127.0.0.1:8000")
    args = ap.parse_args()

    with open(args.image, "rb") as f:
        b64 = base64.b64encode(f.read()).decode()
    body = {
        "model": "default",
        "messages": [{
            "role": "user",
            "content": [
                {"type": "image_url",
                 "image_url": {"url": f"data:image/png;base64,{b64}"}},
                {"type": "text", "text": args.question},
            ],
        }],
        "max_tokens": 128,
    }
    req = urllib.request.Request(
        args.url + "/v1/chat/completions",
        data=json.dumps(body).encode(),
        headers={"Content-Type": "application/json"},
    )
    with urllib.request.urlopen(req) as resp:
        out = json.load(resp)
    print(out["choices"][0]["message"]["content"])


if __name__ == "__main__":
    main()
