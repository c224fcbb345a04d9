// Native .pbrt tokenizer (role of reference parser.cpp:130-266 Tokenizer):
// single pass over the scene file, emitting token spans + pre-parsed numbers
// so the Python front-end never touches per-number string conversion.
//
// Exported C ABI:
//   long tokenize(const char* text, long n,
//                 int* types, long* offsets, int* lengths, double* numbers,
//                 long max_tokens);
// types: 0=atom, 1=quoted string (span excludes quotes), 2='[', 3=']',
//        4=number (value in numbers[i]). Returns token count or -1 on overflow.
#include <cstdlib>
#include <cstring>

extern "C" long tokenize(const char* text, long n, int* types, long* offsets,
                         int* lengths, double* numbers, long max_tokens) {
    long count = 0;
    long i = 0;
    while (i < n) {
        char ch = text[i];
        if (ch == ' ' || ch == '\t' || ch == '\n' || ch == '\r') { i++; continue; }
        if (ch == '#') {
            while (i < n && text[i] != '\n') i++;
            continue;
        }
        if (count >= max_tokens) return -1;
        if (ch == '"') {
            long start = ++i;
            while (i < n && text[i] != '"') i++;
            types[count] = 1;
            offsets[count] = start;
            lengths[count] = (int)(i - start);
            numbers[count] = 0;
            count++;
            i++;  // closing quote
            continue;
        }
        if (ch == '[' || ch == ']') {
            types[count] = ch == '[' ? 2 : 3;
            offsets[count] = i;
            lengths[count] = 1;
            numbers[count] = 0;
            count++;
            i++;
            continue;
        }
        long start = i;
        while (i < n) {
            char c = text[i];
            if (c == ' ' || c == '\t' || c == '\n' || c == '\r' || c == '"' ||
                c == '[' || c == ']' || c == '#')
                break;
            i++;
        }
        int len = (int)(i - start);
        // try number
        char buf[64];
        bool is_num = false;
        double val = 0;
        char c0 = text[start];
        if (len < 63 && (c0 == '-' || c0 == '+' || c0 == '.' ||
                         (c0 >= '0' && c0 <= '9'))) {
            std::memcpy(buf, text + start, len);
            buf[len] = 0;
            char* end = nullptr;
            val = std::strtod(buf, &end);
            is_num = end == buf + len;
        }
        types[count] = is_num ? 4 : 0;
        offsets[count] = start;
        lengths[count] = len;
        numbers[count] = val;
        count++;
    }
    return count;
}
